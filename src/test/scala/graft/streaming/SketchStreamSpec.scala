package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The streaming-sketch claims, demonstrated:
  *  - cells streamed in across batches (including a restart on the same
  *    checkpoint) merge-on-read to EXACTLY the batch sketch of the full
  *    data — bit-equality by count commutativity, not a tolerance;
  *  - quantile extraction off the merged store keeps the one-sided
  *    < 2^-5 contract against exact per-window percentiles;
  *  - a crash-replayed batch overwrites its own partition: cell totals
  *    unchanged (exactly-once without any read-modify-write).
  */
class SketchStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  test("streamed cells ≡ batch sketch; quantiles one-sided; replay-safe") {
    val dir = tmp("sk_events"); val ckpt = tmp("sk_ck"); val store = tmp("sk_store")
    val ev = Tables.events(spark, sf).select($"ts", $"value")
      .localCheckpoint(true)

    // run 1: two thirds; run 2 (restart, same checkpoint): the rest
    ev.filter($"ts".cast("long") % 3 =!= 0)
      .coalesce(1).write.mode("append").parquet(dir)
    SketchStream.run(spark, dir, ckpt, store).awaitTermination()
    ev.filter($"ts".cast("long") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(dir)
    SketchStream.run(spark, dir, ckpt, store).awaitTermination()

    def cellMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val streamed = cellMap(SketchStream.merged(spark, store))
    val batch = cellMap(SketchStream.cells(
      ev.select(date_trunc("day", $"ts").as("w_start"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("v"))))
    assert(streamed == batch, "merge-on-read diverged from the batch sketch")

    // quantiles off the store: one-sided within 2^-5 of the exact
    // per-window percentile
    val est = SketchStream.quantiles(spark, store, Seq(50, 95))
      .collect().map(r => (r.getTimestamp(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val vals = ev.select(date_trunc("day", $"ts").as("w"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("v"))
      .collect().groupBy(_.getTimestamp(0))
      .map { case (w, rows) => w -> rows.map(_.getLong(1)).sorted }
    for (((w, q), (n, e)) <- est) {
      val sorted = vals(w)
      assert(n == sorted.length)
      val exact = sorted((math.ceil(q / 100.0 * n) - 1).toInt)
      assert(e <= exact, s"w=$w q=$q est=$e exact=$exact not one-sided")
      assert((exact - e).toDouble / exact < 1.0 / 32, s"w=$w q=$q off-bound")
    }

    // crash-replay the last batch id with the same data: totals unchanged
    val before = streamed
    SketchStream.processBatch(
      ev.filter($"ts".cast("long") % 3 === 0).select($"ts", $"value"),
      1L, store)
    assert(cellMap(SketchStream.merged(spark, store)) == before,
      "replayed batch changed cell totals")

    // compaction collapses the batch partitions without changing a cell
    SketchStream.compact(spark, store)
    assert(cellMap(SketchStream.merged(spark, store)) == before,
      "compaction changed cell totals")
    val parts = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(parts.length == 1, s"compaction left partitions: $parts")
  }
}
