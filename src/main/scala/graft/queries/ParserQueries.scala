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
            $"l_orderkey", $"l_linenumber", $"l_returnflag" === "A")
          .groupBy($"l_orderkey", $"seg")
          .agg(count(lit(1)).as("n_lines"),
            Relational.dsum($"l_quantity").as("seg_qty"))
          .orderBy($"l_orderkey", $"seg")
      },
      Some("""WITH flagged AS (
          SELECT l_orderkey, l_linenumber, l_quantity,
            CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS is_delim
          FROM lineitem WHERE l_orderkey <= 1000),
        seg AS (
          SELECT *, CAST(SUM(is_delim) OVER (PARTITION BY l_orderkey
            ORDER BY l_linenumber ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
          FROM flagged)
        SELECT l_orderkey, seg, COUNT(*) AS n_lines,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS seg_qty
        FROM seg WHERE is_delim = 0
        GROUP BY l_orderkey, seg ORDER BY l_orderkey, seg""")),

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
