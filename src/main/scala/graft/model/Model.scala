package graft.model

/** Typed row models for the four Clojush load tables
  * (reference src/db_loader.clj:36-39) and the parsed-run IR.
  *
  * `rundate` / `csv_write_time` are kept as formatted strings
  * ("yyyy-MM-dd HH:mm:ss") to match the reference's rendered-datetime columns
  * (reference src/db_loader.clj:42,106-117).
  */
final case class ExperimentRow(
    id: Long,
    user: String,
    rundate: String,
    problem_name: String,
    problem_id: Long,
    clojush_version: String,
    logfile_location: String,
    csv_write_time: String)

/** EAV row for the `experiment` table (reference src/db_loader.clj:37). */
final case class ParamRow(id: Long, parameter: String, value: String)

/** EAV row for the `generations` table (reference src/db_loader.clj:38). */
final case class GenerationRow(id: Long, gennum: Int, parameter: String, value: String)

/** Summary row (reference src/db_loader.clj:39; intended one-row semantics —
  * the reference's write-summary is bugged, see SURVEY.md §0). */
final case class SummaryRow(id: Long, successp: Boolean, maxgen: Int)

/** Parser IR: one parsed log file (language-agnostic of sink).
  * Fields are Seq (not Vector) so Spark's product Encoder derives cleanly. */
final case class ParsedRun(
    headerParams: Seq[(String, String)],
    generations: Seq[(Int, Seq[(String, String)])],
    summary: Option[(Boolean, Int)],
    clojushVersion: Option[String])

/** One entry of the EDN sidecar `index.clj` (reference src/db_loader.clj:269-292). */
final case class CommandMap(uuid: String, argmap: Map[String, String])
