package graft.streaming

import graft.parse.{LogParser, LogPipeline}
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental ingest (SURVEY.md §2.12 T1–T3): the reference's folder-watch +
  * size-threshold-flush shell loop (scripts/load_csv_to_cloud.sh:107-148)
  * re-expressed as ONE Structured Streaming query:
  *
  *  - T1 new-file detection: the streaming file source's checkpoint replaces
  *    the grep/SQL-count dedup — a file is processed exactly once;
  *  - T2 flush unit: the micro-batch replaces the 500 MB CSV buffer;
  *    `Trigger.AvailableNow` drains everything pending then stops (the batch
  *    driver), `ProcessingTime` keeps watching (the daemon);
  *  - T3 exactly-once: checkpoint + idempotent `foreachBatch` (batchId guard
  *    or upsert sink) replaces the reserve-id/sentinel-delete dance.
  */
object IngestStream {

  /** Watch `logDir` for Clojush logs; per micro-batch, parse and hand the
    * four tables to `sink`. Runs until no files remain (AvailableNow) when
    * `availableNow = true`.
    */
  def run(
      spark: SparkSession,
      logDir: String,
      checkpointDir: String,
      cfg: LogPipeline.LoadConfig = LogPipeline.LoadConfig(),
      availableNow: Boolean = true)(
      sink: (LogPipeline.LoadedTables, Long) => Unit): StreamingQuery = {
    import spark.implicits._

    val stream = spark.readStream
      .option("wholetext", "true")
      .text(logDir)
      .select($"value", input_file_name().as("path"))

    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parsed = batch.as[(String, String)]
          .map { case (content, path) =>
            (path, LogParser.parseClojush(content, cfg.skipNils))
          }
          .toDF("path", "run")
        val tables = tablesFromParsed(spark, parsed, cfg, batchId)
        // the cached per-batch Dataset must not outlive the batch — under the
        // ProcessingTime daemon an un-released cache grows without bound
        try sink(tables, batchId) finally tables.release()
        ()
      }

    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }

  /** Batch-local table construction; ids are unique across batches by
    * offsetting with the batchId (deterministic per batch: path-ordered).
    * The per-batch id window is 1e12: a backlog drained by AvailableNow is
    * one micro-batch, so the window must exceed any plausible file count —
    * at 1e12 ids per batch, Long overflows only after ~9.2M batches (years
    * of a 10s daemon trigger).
    */
  private val idWindow = 1000000000000L
  private def tablesFromParsed(
      spark: SparkSession,
      parsed: DataFrame,
      cfg: LogPipeline.LoadConfig,
      batchId: Long): LogPipeline.LoadedTables = {
    import spark.implicits._
    val base = cfg.baseId + batchId * idWindow
    val withId = graft.ids.IdMinter.mintIds(parsed, base, "id", col("path"))
    // the streaming text source exposes no _metadata mtime — empty, like the
    // reference's CSV path when no run date is derivable
    val runs = withId.select($"id", $"path", lit("").as("mtime"), $"run")
      .as[(Long, String, String, ParsedRun)].cache()
    LogPipeline.tablesFromParsed(runs, cfg)
      .copy(release = () => { runs.unpersist(); () })
  }

  /** Event-time windowed streaming aggregation (T4): watermarked tumbling
    * count per event_type — the streaming twin of the batch-oracle-checked
    * `t4_tumbling_hour` query.
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
}
