package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.sources.InvertedIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The incremental-index claims, demonstrated end-to-end:
  *  - a corpus streamed in across TWO separate runs (restart on the same
  *    checkpoint) yields a live index whose BM25 ranking EXACTLY equals
  *    the full-scan `x_bm25_topk` QueryDef over the same corpus;
  *  - the appended table keeps its bucket spec, so the live query path is
  *    still bucket-pruned to the query terms' buckets;
  *  - a crash-replayed batch (its postings appended twice, stats marker
  *    once) changes NOTHING at query time — the distinct() collapse.
  */
class IndexStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def dropTable(t: String): Unit =
    SparkTestSession.dropManagedTable(t)

  test("streamed live index ≡ full-scan BM25; pruned scan; replay-safe") {
    Seq("ix_live", "ix_live_stats").foreach(dropTable)
    val dir = tmp("ix_docs")
    val ckpt = tmp("ix_ck")
    try {
      val docs = Tables.documents(spark, sf)
        .select($"doc_id", $"text").localCheckpoint(true)

      // run 1: two chunks of the corpus arrive
      Seq(0, 1).foreach { m =>
        docs.filter($"doc_id" % 3 === m)
          .coalesce(1).write.mode("append").parquet(dir)
      }
      IndexStream.run(spark, dir, ckpt, "ix_live", buckets = 8)
        .awaitTermination()

      // run 2 (RESTART, same checkpoint): the last chunk arrives; the
      // first two files must not be re-ingested
      docs.filter($"doc_id" % 3 === 2)
        .coalesce(1).write.mode("append").parquet(dir)
      IndexStream.run(spark, dir, ckpt, "ix_live", buckets = 8)
        .awaitTermination()

      // incremental append happened (≥ 2 committed batches, not a rebuild)
      val statBatches = spark.table("ix_live_stats")
        .filter($"nd" > 0).count()
      assert(statBatches >= 2, s"expected ≥2 non-empty batches, $statBatches")
      // nd sums to the corpus (every doc has ≥1 token in this corpus)
      val ndTotal = spark.table("ix_live_stats").agg(sum($"nd")).head.getLong(0)
      assert(ndTotal == docs.count(), "stats nd must sum to the corpus size")

      // the QueryDef's query: 5 highest-df terms, same tiebreak
      // (countDistinct so the derivation is itself replay-safe)
      val terms = spark.table("ix_live")
        .groupBy($"term").agg(countDistinct($"doc_id").as("df"))
        .orderBy($"df".desc, $"term").limit(5)
        .select($"term").as[String].collect().toSeq

      val viaLive = InvertedIndex.bm25TopKLive(spark, "ix_live", terms, 20)

      // bucket pruning survives the appends
      val plan = viaLive.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"live scan is not bucket-aware:\n$plan")
      assert(sel.get.group(2).toInt == 8 &&
        sel.get.group(1).toInt <= terms.size,
        s"expected ≤${terms.size} of 8 buckets, got ${sel.get.group(1)}")

      // exact parity with the full-scan QueryDef
      val expected = graft.SparkEntry.queries("x_bm25_topk")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      def ranking() = viaLive.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(ranking() == expected,
        s"live index ranking diverged:\n${ranking()}\nvs\n$expected")

      // crash replay: re-append one chunk's postings rows verbatim (the
      // at-least-once window: postings landed, marker did not, batch
      // replayed) — query results must not move
      val tok = docs.filter($"doc_id" % 3 === 0)
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .filter(length($"term") > 0)
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .join(dl, "doc_id").select("term", "doc_id", "tf", "dl")
        .write.bucketBy(8, "term").sortBy("term")
        .mode("append").format("parquet").saveAsTable("ix_live")
      assert(ranking() == expected,
        "replayed duplicate postings must be invisible at query time")

      // sealing the live table (replay duplicates INCLUDED) collapses
      // them, bakes df back on, and yields the sealed query path with
      // the same ranking — the compaction step of the lifecycle
      Seq("ix_sealed", "ix_sealed_stats").foreach(dropTable)
      InvertedIndex.seal(spark, "ix_live", "ix_sealed")
      val sealedRank = InvertedIndex.bm25TopK(spark, "ix_sealed", terms, 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(sealedRank == expected, "sealed ranking diverged from live")
      // sealed row count = distinct live postings (duplicates collapsed)
      assert(spark.table("ix_sealed").count() ==
        spark.table("ix_live").distinct().count())

      // edge cases on both query paths: unknown terms ⇒ empty, not error
      assert(InvertedIndex
        .bm25TopKLive(spark, "ix_live", Seq("zzz_no_such_term"), 5).isEmpty)
      assert(InvertedIndex
        .bm25TopK(spark, "ix_sealed", Seq("zzz_no_such_term"), 5).isEmpty)
      // k beyond the corpus ⇒ all scored docs, still ordered
      val all = InvertedIndex
        .bm25TopKLive(spark, "ix_live", terms.take(1), 100000)
      assert(all.count() > 0 && all.count() <= docs.count())
    } finally {
      Seq("ix_live", "ix_live_stats", "ix_sealed", "ix_sealed_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
