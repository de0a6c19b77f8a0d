package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev harness: time headline queries under config variations (AQE on/off,
  * iterations) to pick Bench settings. Not part of the driver contract.
  */
object BenchTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Seq(("aqe_on", "true"), ("aqe_off", "false")).foreach { case (tag, aqe) =>
      val spark = SparkSession.builder()
        .master("local[32]")
        .appName(s"bench-tune-$tag")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val qs = SparkEntry.queries
      SparkEntry.benchQueries.foreach { n =>
        val times = (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          qs(n)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[$tag] $n%-24s ${times.map(t => f"$t%.3f").mkString(" ")}")
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
