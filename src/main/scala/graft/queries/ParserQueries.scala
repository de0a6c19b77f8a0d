package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Oracle-checkable forms of the reference's stream-reshaping operators
  * (SURVEY.md §2.5 R1/R4): regex-delimited segmentation as a running-sum
  * window (the chunked-fallback form of `seq-split`,
  * reference src/db_loader.clj:54-63), and positional KV explosion
  * (reference src/db_loader.clj:139-143).
  *
  * The per-file in-task form of the same operators lives in graft.parse
  * (LogParser) and is covered by golden tests; these queries pin the windowed
  * form against DuckDB on the shared parquet corpus.
  */
object ParserQueries {

  /** Total line order: l_linenumber is NOT unique per order in the corpus,
    * so all order-sensitive window forms tiebreak on returnflag (A<N<R) —
    * a stream operator needs a total order or group assignment at ties is
    * engine-dependent.
    */
  private def lineOrd(s: SparkSession): org.apache.spark.sql.Column = {
    import s.implicits._
    $"l_linenumber" * 100 +
      when($"l_returnflag" === "A", 0)
        .when($"l_returnflag" === "N", 10).otherwise(20) +
      when($"l_linestatus" === "F", 0).otherwise(1)
  }
  private val lineOrdSql: String =
    """l_linenumber * 100 + CASE l_returnflag
      WHEN 'A' THEN 0 WHEN 'N' THEN 10 ELSE 20 END + CASE l_linestatus
      WHEN 'F' THEN 0 ELSE 1 END"""

  val defs: Seq[QueryDef] = Seq(

    // ---- R1: delimiter segmentation via running-sum window -----------------
    // "lines" = lineitem rows ordered by l_linenumber within l_orderkey;
    // delimiter = l_returnflag = 'A' (dropped, like seq-split's delimiters).
    QueryDef(
      "r1_segmentation",
      (s, d) => {
        import s.implicits._
        graft.operators.Segmenter.delimiterSegments(
            Tables.lineitem(s, d).filter($"l_orderkey" <= 1000),
            $"l_orderkey", lineOrd(s), $"l_returnflag" === "A")
          .groupBy($"l_orderkey", $"seg")
          .agg(count(lit(1)).as("n_lines"),
            Relational.dsum($"l_quantity").as("seg_qty"))
          .orderBy($"l_orderkey", $"seg")
      },
      Some(s"""WITH flagged AS (
          SELECT l_orderkey, l_quantity, $lineOrdSql AS line_ord,
            CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS is_delim
          FROM lineitem WHERE l_orderkey <= 1000),
        seg AS (
          SELECT *, CAST(SUM(is_delim) OVER (PARTITION BY l_orderkey
            ORDER BY line_ord ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
          FROM flagged)
        SELECT l_orderkey, seg, COUNT(*) AS n_lines,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS seg_qty
        FROM seg WHERE is_delim = 0
        GROUP BY l_orderkey, seg ORDER BY l_orderkey, seg""")),

    // ---- R2: marker-started segmentation via running-sum window ------------
    // marker rows (l_returnflag = 'A') START a segment and stay as its head;
    // pre-marker rows are dropped — the windowed form of ECJ read-gen.
    QueryDef(
      "r2_marker_segments",
      (s, d) => {
        import s.implicits._
        graft.operators.Segmenter.markerSegments(
            Tables.lineitem(s, d).filter($"l_orderkey" <= 1000),
            $"l_orderkey", lineOrd(s), $"l_returnflag" === "A")
          .groupBy($"l_orderkey", $"seg")
          .agg(count(lit(1)).as("n_lines"),
            min($"l_linenumber").as("head_line"))
          .orderBy($"l_orderkey", $"seg")
      },
      Some(s"""WITH flagged AS (
          SELECT l_orderkey, l_linenumber, $lineOrdSql AS line_ord,
            CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS is_marker
          FROM lineitem WHERE l_orderkey <= 1000),
        seg AS (
          SELECT *, CAST(SUM(is_marker) OVER (PARTITION BY l_orderkey
            ORDER BY line_ord ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
          FROM flagged)
        SELECT l_orderkey, seg, COUNT(*) AS n_lines,
          MIN(l_linenumber) AS head_line
        FROM seg WHERE seg > 0
        GROUP BY l_orderkey, seg ORDER BY l_orderkey, seg""")),

    // ---- R3: continuation merge via anchor window + ordered string agg -----
    // rows with l_linestatus = 'O' are "continuations" appended onto the
    // nearest preceding anchor row — the windowed form of ECJ group-gen.
    QueryDef(
      "r3_continuation_merge",
      (s, d) => {
        import s.implicits._
        graft.operators.Segmenter.mergeContinuations(
            Tables.lineitem(s, d).filter($"l_orderkey" <= 500),
            $"l_orderkey", lineOrd(s),
            $"l_linestatus" === "O", $"l_returnflag")
          // fully-duplicate rows can tie even on lineOrd; two identical
          // anchors then form groups whose (part, ord) collide — merged
          // joins the sort so row order is content-deterministic
          .orderBy($"part", $"ord", $"merged")
      },
      Some(s"""WITH flagged AS (
          SELECT l_orderkey, l_returnflag, $lineOrdSql AS line_ord,
            CASE WHEN l_linestatus = 'O' THEN 0 ELSE 1 END AS is_anchor
          FROM lineitem WHERE l_orderkey <= 500),
        anchored AS (
          SELECT *, CAST(SUM(is_anchor) OVER (PARTITION BY l_orderkey
            ORDER BY line_ord ROWS UNBOUNDED PRECEDING) AS BIGINT) AS anchor
          FROM flagged)
        SELECT l_orderkey AS part, MIN(line_ord) AS ord,
          string_agg(trim(l_returnflag), ' ' ORDER BY line_ord) AS merged
        FROM anchored WHERE anchor > 0
        GROUP BY l_orderkey, anchor ORDER BY part, ord, merged""")),

    // ---- R4: positional KV explosion (EAV flatten) -------------------------
    QueryDef(
      "r4_kv_explode",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .filter($"doc_id" < 20)
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "token")))
          .orderBy($"doc_id", $"pos")
      },
      Some("""SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, string_split(text, ' ')[i] AS token
        FROM documents, unnest(generate_series(1, len(string_split(text, ' ')))) AS t(i)
        WHERE doc_id < 20 ORDER BY doc_id, pos"""))
  )
}
