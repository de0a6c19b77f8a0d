package graft.streaming

import graft.ids.IdMinter
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
    *
    * Oversized-file caveat: the streaming text source materializes each
    * file as ONE wholetext row before this code runs, so the batch path's
    * chunked dispatch (LogPipeline.load / BigLogParse) cannot apply here —
    * a multi-GB log in the watched folder lands on a single source task.
    * Route known-oversized logs through the batch `LogPipeline.load`
    * (which dispatches on size) instead of the watch folder.
    *
    * @param initialProblemDim seed (problem_name, problem_id) rows, e.g.
    *        read back from the dimension table on daemon restart, so ids
    *        stay stable across PROCESS restarts too (within one run the
    *        dictionary is threaded batch-to-batch automatically)
    */
  def run(
      spark: SparkSession,
      logDir: String,
      checkpointDir: String,
      cfg: LogPipeline.LoadConfig = LogPipeline.LoadConfig(),
      availableNow: Boolean = true,
      initialProblemDim: Option[DataFrame] = None)(
      sink: (LogPipeline.LoadedTables, Long) => Unit): StreamingQuery = {
    import spark.implicits._

    val stream = spark.readStream
      .option("wholetext", "true")
      .text(logDir)
      .select($"value", input_file_name().as("path"))

    // problem dictionary accumulated across micro-batches (get-or-create,
    // reference problem_data map): same name → same id in every batch, new
    // names extend past the max. Threaded DRIVER-SIDE as a plain Seq —
    // name-cardinality tiny by contract — so per-batch get-or-create costs
    // zero Spark jobs (the DataFrame arm cost 3-4 tiny jobs per batch).
    // foreachBatch bodies run strictly sequentially, so a var is race-free.
    var dimSeq: Seq[(String, Long)] = initialProblemDim
      .map(_.select("problem_name", "problem_id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
      .getOrElse(Nil)

    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (tables, nextDim) =
          tablesFromBatch(spark, batch, cfg, batchId, dimSeq)
        dimSeq = nextDim
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
  private def tablesFromBatch(
      spark: SparkSession,
      batch: DataFrame,
      cfg: LogPipeline.LoadConfig,
      batchId: Long,
      dimSeq: Seq[(String, Long)])
      : (LogPipeline.LoadedTables, Seq[(String, Long)]) = {
    import spark.implicits._
    val base = cfg.baseId + batchId * idWindow

    // one driver-side (path → id, mtime) map per micro-batch, from the
    // PRE-parse path projection — file contents and parsed structs never
    // enter a sort or shuffle, the parse closure runs exactly once, and a
    // micro-batch's path list is file-count bounded by construction
    // (maxFilesPerTrigger-sized). ids: dense by sorted path (IdMinter
    // contract); mtime: driver-side file stat, since the streaming text
    // source exposes no _metadata — keeping streaming rows identical to
    // the batch path's _metadata.file_modification_time
    // (reference src/db_loader.clj:106-109).
    val paths = batch.select($"path").distinct().as[String].collect().sorted
    val pathMeta = pathMetaMap(spark, paths, base)

    // get-or-create the problem dictionary for THIS batch: the threaded dim
    // only covers names from earlier batches, and `tablesFromParsed` demands
    // a COMPLETE dim — a stale one silently drops new problems' rows at the
    // inner broadcast join. Batch names come free from the collected path
    // list (problemNameOf is the driver-side twin of problemNameCol); the
    // get-or-create itself runs driver-side (zero jobs): seen names keep
    // their ids, new names extend past the max.
    val nextDim = IdMinter.dictionaryEncodeLocal(
      paths.toSeq.map(LogPipeline.problemNameOf(_, cfg)), dimSeq)
    val dim = nextDim.toDF("problem_name", "problem_id")

    val parsed = batch.as[(String, String)]
      .map { case (content, path) =>
        (path, LogParser.parseClojush(content, cfg.skipNils))
      }
      .toDF("path", "run")

    val runs = parsed
      .join(broadcast(pathMeta), Seq("path"))
      .select($"id", $"path", $"mtime", $"run")
      .as[(Long, String, String, ParsedRun)]
    // tablesFromParsed caches its flat single-pass parse output and hands
    // back the unpersist in `release` — no second cache needed here
    (LogPipeline.tablesFromParsed(runs, cfg, Some(dim)), nextDim)
  }

  /** (path, id, mtime) rows for a sorted path list: dense ids from `base`,
    * mtime from a driver-side FileSystem stat — formatted exactly like the
    * batch path's `date_format(_metadata.file_modification_time,
    * 'yyyy-MM-dd HH:mm:ss')` in the session time zone. A file deleted
    * between listing and stat yields "" (the reference's
    * no-derivable-rundate CSV behavior).
    */
  private def pathMetaMap(
      spark: SparkSession, sortedPaths: Array[String], base: Long): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val tz = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID))
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(tz)
    sortedPaths.zipWithIndex.toSeq.map { case (p, i) =>
      val hp =
        try new org.apache.hadoop.fs.Path(new java.net.URI(p))
        catch { case _: java.net.URISyntaxException =>
          new org.apache.hadoop.fs.Path(p) }
      val mtime =
        try fmt.format(java.time.Instant.ofEpochMilli(
          hp.getFileSystem(conf).getFileStatus(hp).getModificationTime))
        catch { case _: java.io.IOException => "" }
      (p, base + i + 1L, mtime)
    }.toDF("path", "id", "mtime")
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
