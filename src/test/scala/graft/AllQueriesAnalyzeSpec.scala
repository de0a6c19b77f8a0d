package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must at least ANALYZE against the real sf0.001
  * fixtures. Full execution is the driver's DuckDB gate (and the 90s local
  * Verify run); this spec exists because the r11 regression — the events
  * fixture changing parquet timestamp unit — broke ~15 queries at ANALYSIS
  * time, which a `.schema` touch catches in seconds. A fixture-format
  * drift anywhere in the corpus now turns `sbt test` red instead of
  * silently shrinking the correctness artifact.
  *
  * Note: queries whose CONSTRUCTION runs jobs (e.g. k-means seeding for
  * IVF variants) do real work here; that is the price of touching all of
  * them, and at sf0.001 it stays cheap.
  */
class AllQueriesAnalyzeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("all declared queries analyze against sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).schema; None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty, s"\n${failures.size} queries failed analysis:\n" +
      failures.mkString("\n"))
  }
}
