package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming quantile-sketch maintenance — the incremental form of
  * x_quantile_sketch, and the payoff of choosing a MERGEABLE sketch:
  * because the HdrHistogram sketch is a commutative (window, bucket)
  * count table, the streaming store needs NO read-modify-write at all.
  * Each micro-batch appends its own cells under `batch=B` (dynamic
  * partition overwrite — the AnnStream exactly-once discipline: a
  * crash-replayed batch replaces its own partition), and the reader
  * MERGES ON READ with one groupBy-sum over the cell store. Streamed
  * cells are therefore bit-identical to a batch sketch of the full data
  * by commutativity — spec-pinned, not approximate.
  *
  * At 100 TB: per-batch cost is one map-side-combined groupBy of the
  * batch's own rows (cells ≤ 64·32 per window — the write is KBs no
  * matter the batch size); the store grows by one tiny partition per
  * batch and compacts trivially (re-write the groupBy-sum under one
  * partition); serving cost is a scan of cell rows, not data rows.
  */
object SketchStream {

  /** Sketch cells for one frame of (w_start TIMESTAMP, v LONG ≥ 1):
    * the x_quantile_sketch bucketing — power-of-two buckets with 5
    * mantissa bits, pure integer. ONE definition with the batch gate
    * (any drift would break the spec's streamed ≡ batch pin). */
  def cells(frame: DataFrame): DataFrame =
    frame
      .withColumn("v", graft.functions.FixedPoint.requirePositive(
        col("v"), "SketchStream.cells"))
      .withColumn("p", expr(
        "shiftleft(cast(1 as bigint), greatest(length(bin(v)) - 6, 0))"))
      .select(col("w_start"), expr("(v div p) * p").as("lb"))
      .groupBy(col("w_start"), col("lb")).agg(count(lit(1)).as("c"))

  /** Watch `eventsDir` for parquet (ts TIMESTAMP, value DOUBLE); per
    * micro-batch, append the batch's day-window cells to the store. */
  def run(
      spark: SparkSession,
      eventsDir: String,
      checkpointDir: String,
      storePath: String,
      availableNow: Boolean = true): StreamingQuery = {
    val stream = spark.readStream
      .schema("ts TIMESTAMP, value DOUBLE")
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

  /** One batch: cents-quantize, bucket, append cells exactly-once.
    * Public for the replay-idempotence spec and direct drivers. */
  def processBatch(batch: DataFrame, batchId: Long,
      storePath: String): Unit =
    cells(batch.select(date_trunc("day", col("ts")).as("w_start"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v")))
      .withColumn("batch", lit(batchId))
      .write
      .partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(storePath)

  /** Merge-on-read: the current sketch — cell-wise sum across all batch
    * partitions. Identical to a batch sketch of all streamed rows. */
  def merged(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .groupBy(col("w_start"), col("lb")).agg(sum(col("c")).as("c"))

  /** Compaction: collapse all batch partitions into one merged partition
    * under `compactedAs` (a batch id above every live one, conventionally
    * Long.MaxValue-side), then drop the absorbed partitions. Readers see
    * the same merged cells before, during (append-only + commutative
    * sums; a concurrent read over old+new partitions double-counts
    * NOTHING because the old partitions are removed only after the
    * merged one is fully written), and after. Run between streaming
    * runs — not while a writer holds the store. */
  def compact(spark: SparkSession, storePath: String,
      compactedAs: Long = 9000000000000000000L): Unit = {
    val path = new org.apache.hadoop.fs.Path(storePath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val old = fs.listStatus(path).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filter(_.getName != s"batch=$compactedAs")
    val snapshot = merged(spark, storePath).localCheckpoint(true)
    snapshot
      .withColumn("batch", lit(compactedAs))
      .write
      .partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(storePath)
    old.foreach(p => fs.delete(p, true))
  }

  /** Per-window quantile estimates off the merged sketch (the
    * x_quantile_sketch extraction: smallest bucket whose cumulative
    * count reaches ceil(q·n); one-sided, rel error < 2^-5). */
  def quantiles(spark: SparkSession, storePath: String,
      qpcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sk = merged(spark, storePath)
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("w_start"))
          .orderBy(col("lb"))))
    val qf = spark.createDataFrame(qpcts.map(Tuple1(_))).toDF("qpct")
    val tgt = sk.groupBy(col("w_start")).agg(sum(col("c")).as("n"))
      .crossJoin(broadcast(qf))
      .withColumn("target", expr("(n * qpct + 99) div 100"))
    tgt.join(sk, Seq("w_start")).filter(col("cum") >= col("target"))
      .groupBy(col("w_start"), col("qpct"), col("n"))
      .agg(min(col("lb")).as("est_cents"))
      .orderBy(col("w_start"), col("qpct"))
  }
}
