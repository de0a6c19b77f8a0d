package graft.streaming

import graft.ext.Hll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming cardinality maintenance — the HLL twin of [[SketchStream]]:
  * per-window distinct-user estimates over an event stream with NO
  * stateful operator and NO read-modify-write. Each micro-batch appends
  * its own (window, bucket, rho) cells exactly-once (dynamic partition
  * overwrite under `batch=B`); the reader merges by per-bucket MAX —
  * idempotent AND commutative, so streamed cells equal a batch pass's
  * bit-for-bit (spec-pinned), and, unlike count-based stores, even
  * REPROCESSING data outside the replay protocol cannot inflate the
  * estimate (max absorbs duplicates). Bucketing, registers, and the
  * integer estimate pipeline are ONE definition shared with the
  * x_hll_window gate and its oracle ([[graft.ext.Hll]], m = 1024 —
  * rsd ≈ 3.25%; r14 verdict item 5).
  *
  * At 100 TB: per-batch cost is one map-side-combined groupBy of the
  * batch's own rows to ≤ m cells per window; the serving scan reads
  * cell rows only. Contrast `approx_count_distinct` under watermarked
  * streaming aggregation: its sketch state lives inside the state store,
  * unreadable across engines and unmergeable at rest.
  */
object HllStream {

  val P: Hll.Params = Hll.Default

  /** HLL cells for one frame of (w_start TIMESTAMP, user_id LONG) — ONE
    * definition with the x_hll_window bucketing ([[Hll.cells]]). */
  def cells(frame: DataFrame): DataFrame = Hll.cells(frame, col("user_id"), P)

  def run(
      spark: SparkSession,
      eventsDir: String,
      checkpointDir: String,
      storePath: String,
      availableNow: Boolean = true): StreamingQuery = {
    val stream = spark.readStream
      .schema("ts TIMESTAMP, user_id LONG")
      .parquet(eventsDir)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storePath)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer).start()
  }

  def processBatch(batch: DataFrame, batchId: Long,
      storePath: String): Unit =
    EpochStore.writeEpoch(
      cells(batch.select(date_trunc("day", col("ts")).as("w_start"),
        col("user_id"))),
      batchId, storePath)

  /** The max-merge: per-bucket MAX — idempotent AND commutative, the
    * property that makes this store safe even against out-of-protocol
    * reprocessing. ONE definition serves merge-on-read and compaction. */
  private def mergeCells(df: DataFrame): DataFrame =
    df.groupBy(col("w_start"), col("bucket")).agg(max(col("rho")).as("rho"))

  /** Merge-on-read: per-bucket MAX across the live epoch partitions
    * ([[EpochStore.read]], compaction-safe — though max-merge is the one
    * merge where even a non-safe read could not double-count). */
  def merged(spark: SparkSession, storePath: String): DataFrame =
    mergeCells(EpochStore.read(spark, storePath))

  /** Compaction: collapse the live epoch partitions into one max-merged
    * cell partition ([[EpochStore.compact]] — shared discipline, safe
    * for concurrent readers). */
  def compact(spark: SparkSession, storePath: String): Unit =
    EpochStore.compact(spark, storePath, merge = mergeCells)

  /** Per-window cardinality estimates off the merged cells — the
    * x_hll_window integer pipeline ([[Hll.estimate]]: raw + linear-
    * counting correction from the same inlined constant table). */
  def estimates(spark: SparkSession, storePath: String): DataFrame =
    Hll.estimate(merged(spark, storePath), P)
      .orderBy(col("w_start"))
}
