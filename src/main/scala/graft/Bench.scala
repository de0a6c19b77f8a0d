package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (SparkEntry.benchQueries) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver
  * (BENCH_r{N}.json). One warmup pass amortizes JIT + codegen compilation;
  * min-of-3 reports steady-state execution. Session profile: Sessions.local
  * (see its scaladoc for the AQE-off-at-bench-scale rationale).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local("graft-bench", cpus)

    val names = SparkEntry.benchQueries
    val qs = SparkEntry.queries

    // warmup: plan + codegen + parquet footer reads
    names.foreach { n =>
      try qs(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }

    val results = names.map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { qs(name)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
      }
      // a failed query must not masquerade as a (near-zero) fast timing
      name -> (if (times.exists(_.isNaN)) -1.0 else times.min)
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"""\":$v%.4f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFailed = results.count(_._2 < 0)

    // ETL throughput: the reference's own workload (parse logs → 4 tables).
    // Its loader forks one JVM per log file, sequentially; warm logs/s here
    // is the single-node apples-to-apples number.
    val etlLogsPerSec = try {
      val glob = tools.BenchTune.genEtlLogs(200)
      tools.BenchTune.timedLoad(spark, glob) // warm (codegen + dict build)
      val (_, sec) = tools.BenchTune.timedLoad(spark, glob)
      200.0 / sec
    } catch { case e: Throwable =>
      System.err.println(s"[bench] etl failed: ${e.getMessage}"); -1.0 }

    println(f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qJson,"failed":$nFailed,"etl_logs_per_sec":$etlLogsPerSec%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
