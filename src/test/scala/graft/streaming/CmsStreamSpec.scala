package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The streaming-CMS claims: cells streamed across batches (with a
  * checkpoint restart) sum-merge to exactly a batch CMS's cells; point
  * estimates are ≥ exact counts (the CMS one-sided guarantee) and equal
  * the batch sketch's estimates; a crash-replayed batch is
  * bit-idempotent under the epoch discipline — and, the documented
  * CONTRAST with [[HllStream]]'s max-merge, OUT-OF-PROTOCOL duplication
  * DOES inflate a count store, which is exactly why the exactly-once
  * epoch overwrite is load-bearing here. */
class CmsStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  test("streamed ≡ batch cells; estimates ≥ exact; replay-safe; sum inflates on dup") {
    val dir = tmp("cms_docs"); val ckpt = tmp("cms_ck"); val store = tmp("cms_store")
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").localCheckpoint(true)

    docs.filter($"doc_id" % 2 === 0)
      .coalesce(1).write.mode("append").parquet(dir)
    CmsStream.run(spark, dir, ckpt, store).awaitTermination()
    docs.filter($"doc_id" % 2 =!= 0)
      .coalesce(1).write.mode("append").parquet(dir)
    CmsStream.run(spark, dir, ckpt, store).awaitTermination()

    def cellMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = cellMap(CmsStream.merged(spark, store))
    val batch = cellMap(CmsStream.cells(docs.filter($"text".isNotNull)
      .select(explode(split($"text", " ")).as("term"))))
    assert(streamed == batch, "sum-merge diverged from the batch cells")

    // point estimates vs exact: one-sided, and ≥ every exact count
    val exact = docs.filter($"text".isNotNull)
      .select(explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
      .groupBy($"term").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"term").limit(10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = CmsStream.estimates(spark, store, exact.keys.toSeq.sorted)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, c) <- exact)
      assert(est(t) >= c, s"term=$t est=${est(t)} < exact=$c")

    // crash-replay batch 1 (same id, same data): bit-idempotent
    CmsStream.processBatch(docs.filter($"doc_id" % 2 =!= 0), 1L, store)
    assert(cellMap(CmsStream.merged(spark, store)) == streamed,
      "replayed batch changed the cells")

    // OUT-OF-PROTOCOL duplication (new batch id, old data): a count
    // store MUST inflate — the documented contrast with HllStream's
    // max-merge, and the reason the epoch discipline is load-bearing
    CmsStream.processBatch(docs.filter($"doc_id" % 2 === 0), 99L, store)
    val inflated = cellMap(CmsStream.merged(spark, store))
    assert(inflated != streamed,
      "a duplicated count batch failed to inflate — sum-merge broken")

    // compaction collapses to one partition, cells unchanged
    CmsStream.compact(spark, store)
    val parts = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(parts.length == 1, s"compaction left partitions: $parts")
    assert(cellMap(CmsStream.merged(spark, store)) == inflated,
      "compaction changed the cells")
  }
}
