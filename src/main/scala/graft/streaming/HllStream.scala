package graft.streaming

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
  * estimate (max absorbs duplicates). The estimate is the hash-exact
  * integer pipeline of the x_hll_window gate.
  *
  * At 100 TB: per-batch cost is one map-side-combined groupBy of the
  * batch's own rows to ≤ 64 cells per window; the serving scan reads
  * cell rows only. Contrast `approx_count_distinct` under watermarked
  * streaming aggregation: its sketch state lives inside the state store,
  * unreadable across engines and unmergeable at rest.
  */
object HllStream {

  val M = 64

  /** HLL cells for one frame of (w_start TIMESTAMP, user_id LONG) — ONE
    * definition with the x_hll_window bucketing (md5 60-bit family). */
  def cells(frame: DataFrame): DataFrame =
    frame
      .withColumn("h", shiftrightunsigned(
        graft.functions.Md5Hash64.md5_le64(col("user_id").cast("string")), 4))
      .select(col("w_start"), pmod(col("h"), lit(M.toLong)).as("bucket"),
        (lit(55) - length(expr(s"bin(h div $M)"))).as("rho"))
      .groupBy(col("w_start"), col("bucket")).agg(max(col("rho")).as("rho"))

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
    * x_hll_window integer pipeline (raw + linear-counting correction
    * from the same inlined constant table). */
  def estimates(spark: SparkSession, storePath: String): DataFrame = {
    val lut = (1 to M).map(v => math.round(M * math.log(M.toDouble / v)))
    merged(spark, storePath)
      .groupBy(col("w_start")).agg(
        count(lit(1)).as("n_present"),
        sum(expr("shiftright(1000000000000L, rho)")).as("s_present"))
      .withColumn("v_zero", lit(M.toLong) - col("n_present"))
      .withColumn("s_total",
        col("s_present") + col("v_zero") * 1000000000000L)
      .withColumn("hll_raw",
        expr("2905460736000000 div greatest(s_total, 1)"))
      .withColumn("hll_est",
        when(col("hll_raw") <= M * 5 / 2 && col("v_zero") > 0,
          element_at(array(lut.map(lit): _*), col("v_zero").cast("int")))
          .otherwise(col("hll_raw")))
      .select(col("w_start"), col("n_present"), col("v_zero"),
        col("hll_raw"), col("hll_est"))
      .orderBy(col("w_start"))
  }
}
