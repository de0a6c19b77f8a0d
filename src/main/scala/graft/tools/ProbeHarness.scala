package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared scaffolding for BenchTune probes (r18 verdict item 8: probe
  * scaffolding — session bootstrap, steal accounting, timing loops,
  * scale-corpus discovery — was being re-written per probe and BenchTune
  * grew 548 lines in one round; new probes should cost tens of lines).
  * Everything here is dev measurement harness, not product code.
  */
object ProbeHarness {

  /** Host-CPU steal jiffies (guest VM, /proc/stat col 8) — the
    * contamination signal every probe publishes next to its walls. */
  def stealJiffies: Long = try {
    val cols = scala.io.Source.fromFile("/proc/stat").getLines()
      .next().trim.split("\\s+")
    if (cols.length > 8) cols(8).toLong else 0L
  } catch { case _: Throwable => 0L }

  /** Standard probe session: local[32] + the first-job warmup that keeps
    * codegen/scheduler bring-up off the first measured pass. Caller
    * stops it (or use [[withSpark]]). */
  def session(name: String): SparkSession = {
    val spark = graft.Sessions.local(name, 32)
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark
  }

  def withSpark(name: String)(f: SparkSession => Unit): Unit = {
    val spark = session(name)
    try f(spark) finally spark.stop()
  }

  /** The scale ladder: gate corpus plus whichever ScaleGen outputs exist
    * on disk (missing rungs are reported, never silently skipped —
    * silent truncation reads as coverage). */
  def corpora(sfDir: String,
      ladder: Seq[(String, String)] = Seq(
        "10x" -> "/tmp/graft_10x", "100x" -> "/tmp/graft_100x"))
      : Seq[(String, String)] =
    ("1x" -> sfDir) +: ladder.filter { case (tag, dir) =>
      val ok = new java.io.File(s"$dir/documents.parquet").exists()
      if (!ok) println(s"[probe] $tag corpus missing at $dir — skipped")
      ok
    }

  /** Warmup + `passes` timed runs of `body`; returns
    * (median, min, stealSeconds over the timed passes). */
  def timedPasses(passes: Int)(body: => Unit): (Double, Double, Double) = {
    body // warmup
    val s0 = stealJiffies
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.sorted
    (times(times.size / 2), times.head, (stealJiffies - s0) / 100.0)
  }

  /** timedPasses through the bench forcing idiom (noop sink — the
    * protocol every measuring tool shares, BenchProtocol scaladoc). */
  def timedForce(passes: Int)(df: () => DataFrame): (Double, Double, Double) =
    timedPasses(passes)(graft.BenchProtocol.force(df()))

  /** Total shuffle WRITE bytes of `body` — the 100 TB cost proxy (local
    * shuffles cross page cache; on a cluster these bytes cross the
    * network). Registers a listener for the call's duration only. */
  def shuffleWriteBytes(spark: SparkSession)(body: => Unit): Long = {
    val sw = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          sw.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener events are posted async; drain before reading
      org.apache.spark.sql.graft.CatalystBridge.drainListenerBus(spark)
      sw.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
