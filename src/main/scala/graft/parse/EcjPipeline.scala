package graft.parse

import graft.ids.IdMinter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ECJ star-schema load pipeline (reference src/parse_logs_ecj.clj /
  * SURVEY.md §3.3): dimension lookups + get-or-create, LIKE-join problem
  * resolution, per-file parse into generations EAV.
  *
  * The reference drives this REPL-style with per-statement JDBC; here each
  * step is a DataFrame transform: dimensions are broadcast get-or-create
  * (J5 = anti-join + union), the problem lookup is the reference's
  * `probname LIKE '%<folder-leaf>%'` theta join (J3), and the parse path is
  * per-file in-task (zero shuffle), like the Clojush pipeline.
  */
object EcjPipeline {

  /** J5 get-or-create (reference new-batch, :51-60): keep existing
    * (name → id) rows, mint dense ids past the max for unseen names.
    */
  def getOrCreate(existing: DataFrame, incoming: DataFrame,
      nameCol: String, idCol: String): DataFrame =
    IdMinter.dictionaryEncode(incoming, nameCol, idCol, Some(existing))

  /** J3 LIKE-join (reference :43-46): resolve each folder leaf to problem
    * ids whose probname contains it.
    */
  def resolveProblems(problems: DataFrame, folders: DataFrame): DataFrame =
    folders.join(broadcast(problems),
      col("probname").contains(col("folder_leaf")))

  /** Parse every ECJ stat file under `glob` into generations EAV:
    * (expid, gennum, parameter, value). gennum comes from the group-head
    * `Generation: N` (−1 for the `End of Run` group); expid is minted
    * per file, dense from `baseId`.
    */
  def loadGenerations(spark: SparkSession, glob: String, baseId: Long = 0L)
      : DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true").text(glob)
      .select($"value", $"_metadata.file_path".as("path"))
    val withId = IdMinter.mintIdsByKey(raw, baseId, "expid", "path")
    withId.select($"expid", $"path", $"value")
      .as[(Long, String, String)]
      .flatMap { case (expid, _, content) =>
        LogParser.parseEcj(content).flatMap { group =>
          val gennum = group.collectFirst {
            case ("Generation", Some(n)) if n.forall(_.isDigit) => n.toInt
          }.getOrElse(-1)
          group.map { case (k, v) => (expid, gennum, k, v.orNull) }
        }
      }
      .toDF("expid", "gennum", "parameter", "value")
  }

  /** Parse a flat `key=value` parameter file (the reference's broken
    * exp-param-vals, src/parse_logs_ecj.clj:62-65 — intended behavior) into
    * experiment EAV rows for `expid`.
    */
  def paramFileRows(spark: SparkSession, path: String, expid: Long): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(_.contains("="))
      .map { l =>
        val kv = l.split("=", 2)
        (expid, kv(0).trim, if (kv.length > 1) kv(1).trim else "")
      }
      .toDF("expid", "parameter", "value")
  }
}
