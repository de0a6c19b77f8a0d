package graft.sources

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The inverted-index retrieval claim, demonstrated: BM25 over the
  * term-bucketed postings layout returns EXACTLY the full-scan QueryDef's
  * ranking, and the postings scan is bucket-pruned to the query terms'
  * buckets (never the whole table).
  */
class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def dropTable(t: String): Unit =
    SparkTestSession.dropManagedTable(t)

  test("postings BM25 ≡ full-scan BM25; scan prunes to query-term buckets") {
    Seq("ii_postings", "ii_postings_stats").foreach(dropTable)
    try {
      InvertedIndex.buildPostings(
        Tables.documents(spark, sf).select($"doc_id", $"text"),
        "ii_postings", buckets = 8)

      // the QueryDef's query: the 5 highest-df terms, same tiebreak
      val terms = spark.table("ii_postings")
        .groupBy($"term").agg(count(lit(1)).as("df"))
        .orderBy($"df".desc, $"term").limit(5)
        .select($"term").as[String].collect().toSeq

      val viaIndex = InvertedIndex.bm25TopK(spark, "ii_postings", terms, 20)

      // bucket pruning: the scan must touch at most |terms| of 8 buckets
      val plan = viaIndex.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"scan is not bucket-aware:\n$plan")
      val (picked, total) = (sel.get.group(1).toInt, sel.get.group(2).toInt)
      assert(total == 8 && picked <= terms.size,
        s"expected ≤${terms.size} of 8 buckets, scanned $picked of $total")

      // exact parity with the full-scan QueryDef (same ranking, same
      // scores — bm25Fx is the shared definition)
      val expected = graft.SparkEntry.queries("x_bm25_topk")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val got = viaIndex
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expected, s"index ranking diverged:\n$got\nvs\n$expected")
    } finally {
      Seq("ii_postings", "ii_postings_stats").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
