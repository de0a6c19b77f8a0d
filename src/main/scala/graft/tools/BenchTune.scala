package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev harness: time headline queries under config variations (AQE on/off,
  * iterations) to pick Bench settings. Not part of the driver contract.
  */
object BenchTune {

  /** Compare native CosineSim vs HOF cosine on a full self-join scan. */
  def cosineShootout(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.Sessions.local("cosine-shootout", 32)
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
      .cache()
    emb.count()
    val q = emb.filter($"vec_id" < 8).select($"vec_id".as("qid"), $"ev".as("qv"))
    def time(tag: String, c: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        emb.crossJoin(broadcast(q)).select(sum(c($"ev", $"qv"))).collect()
        println(f"[$tag] iter$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("hof", graft.queries.Similarity.cosineHof)
    time("native", graft.queries.Similarity.cosine)
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.headOption.contains("cosine")) { cosineShootout(sfDir); return }
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
