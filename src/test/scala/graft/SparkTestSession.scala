package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (per-suite sessions would pay
  * ~10s startup each). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // same glob-read WARN-noise suppression as Sessions.local
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
      org.apache.logging.log4j.Level.ERROR)
    s
  }

  /** Drop a managed table AND its warehouse directory: a fresh JVM's
    * in-memory catalog has no entry for a leftover directory from a
    * crashed earlier run, so DROP alone is a no-op and the next
    * saveAsTable throws on the existing location. Shared by every spec
    * that creates managed tables. */
  def dropManagedTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
  }
}
