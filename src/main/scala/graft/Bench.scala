package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (SparkEntry.benchQueries) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver
  * (BENCH_r{N}.json). Session profile: Sessions.local (see its scaladoc for
  * the AQE-off-at-bench-scale rationale).
  *
  * Protocol (per query, in isolation):
  *   1. clear the session cache — no query's number depends on what ran
  *      before it (r5 saw an unexplained 3.7x single-query swing that could
  *      not be separated from cross-query cache/storage interplay);
  *   2. one untimed warmup pass (plan + codegen + parquet footers + any
  *      .cache() the query itself declares);
  *   3. ITERS timed passes; report the MEDIAN (headline `queries`/`total`)
  *      and the min (`queries_min`) — the median is robust to a single
  *      GC/compilation stall, the min shows the steady-state floor.
  *
  * PROTOCOL DISCONTINUITY (round 8): execution is forced through the NOOP
  * SINK, not `.count()`. Under count(), ColumnPruning + EliminateSorts
  * strip work that doesn't affect the row count — verified empirically:
  * q1's seven decimal aggregates and every query's final sort were absent
  * from the counted plan, so rounds ≤ 7 under-measured real query cost.
  * The noop writer consumes every output row with all columns
  * materialized. Round-8 numbers are therefore HIGHER than round-7's for
  * the same engine — compare rounds ≥ 8 to each other, or to r7's numbers
  * only qualitatively. The JSON line carries `protocol: "noop-sink"` so
  * the discontinuity is machine-visible.
  *
  * ROUND-10 leg changes: (1) the near-dup leg is `d_minhash_pipeline`
  * (collapse-first over the full corpus — what a production pipeline
  * runs); `d_minhash_pairs` keeps its oracle gate row but is no longer
  * benched (raw pair enumeration is output-bound-quadratic on cloned
  * corpora by contract — r9 100x: 79.2s of the 119.1s total). (2) The
  * ETL leg runs FIRST (fresh JVM — `etl_protocol: "first-400-med5"`);
  * compare etl numbers only within the same etl_protocol. (3) q1 runs
  * 7 timed passes (`iters_q1`).
  *
  * ROUND-13 addition: a second full query leg under the 'orderkey'
  * bucketed at-rest layout (`queries_bucketed`/`total_bucketed` — r12
  * verdict item 4: the bucketed layout is the intended 100 TB at-rest
  * configuration, so its regressions must be visible round-over-round,
  * not measured once). Tables are rewritten fresh (untimed) each run.
  *
  * ROUND-14 leg changes: (1) `t4_session` joins the bench set (10 queries
  * now) — the user_id-keyed event query the new events-by-user_id
  * bucketing serves (r13 verdict item 5); compare `total` to r13 only
  * after subtracting it, or per-query. (2) `steal_plain_s` /
  * `steal_bucketed_s` publish per-leg host-CPU steal (r13 item 1) so
  * uniform drift self-attributes in the committed artifact.
  */
object Bench {
  private val Iters = 5
  private val HeadlineQuery = "q1_pricing_summary"
  private val HeadlineIters = 7

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local("graft-bench", cpus)

    val names = SparkEntry.benchQueries
    val qs = SparkEntry.queries

    // absorb first-job session warmup (codegen compiler, broadcast infra,
    // scheduler) so it doesn't land on the first query's warmup pass
    spark.range(1000000).selectExpr("sum(id)").collect()

    // ETL throughput: the reference's own workload (parse logs → 4 tables).
    // Its loader forks one JVM per log file, sequentially; warm logs/s here
    // is the single-node apples-to-apples number. r8 verdict item 6: the
    // old 200-log median-of-3 with one warmup showed ~4x cross-round
    // variance (195.8 vs 302.6 on near-identical engines) — too noisy for
    // regression detection. Remedy: TWO warmups (the first load
    // JIT-compiles the whole parse pipeline, the second settles it),
    // 400 logs so a run is ~2x longer than the scheduler jitter floor, and
    // median-of-5. ORDER (r9 verdict item 7): the ETL leg runs FIRST, on a
    // fresh JVM — running it after nine query legs left it hostage to
    // their accumulated JIT/GC state, the residual source of the ±20% r9
    // band (r10 two-run band recorded in BENCH_SCALE.json). Leg-first IS
    // the isolation: the r9-era clearCache+GC preamble guarded against
    // prior-query storage state that a fresh JVM no longer has.
    // r13: the r12 "-9% etl drift" turned out to be bursty HOST CPU STEAL
    // (guest VM; /proc/stat col 8), not code — zero parse-path diffs since
    // r10, and phase-timed slow loads slow uniformly across plan+all four
    // counts while the steal counter jumps (BENCH_SCALE.json
    // r13_etl_steal). Two self-documenting fields: etl_logs_per_sec_best
    // (best-of-5 — interference-immune ceiling; compare THIS across
    // rounds when steal_s > ~1) and etl_steal_s (steal seconds during the
    // leg; ~0 = median is trustworthy).
    def stealJiffies: Long = try {
      val cols = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+")
      if (cols.length > 8) cols(8).toLong else 0L
    } catch { case _: Throwable => 0L }
    val stealBefore = stealJiffies
    val (etlLogsPerSec, etlLogsPerSecBest) = try {
      val nLogs = 400
      val glob = tools.BenchTune.genEtlLogs(nLogs)
      tools.BenchTune.timedLoad(spark, glob) // warm 1: codegen + dict build
      tools.BenchTune.timedLoad(spark, glob) // warm 2: settle JIT
      val secs = (1 to 5).map(_ => tools.BenchTune.timedLoad(spark, glob)._2)
      (nLogs / median(secs), nLogs / secs.min)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] etl failed: ${e.getMessage}"); (-1.0, -1.0) }
    val etlStealS = (stealJiffies - stealBefore) / 100.0

    // BenchProtocol.force: noop sink materializes every output row with all
    // columns — count() would let Catalyst prune the actual work (scaladoc)
    def force(name: String): Boolean =
      try { BenchProtocol.force(qs(name)(spark, sfDir)); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }

    def timeLeg(): Seq[(String, (Double, Double))] = names.map { name =>
      spark.sharedState.cacheManager.clearCache()
      // localCheckpoint blocks (lshCandidatePairs, x_contamination) are
      // NOT in the CacheManager — they free via ContextCleaner when their
      // RDD is collected, so nudge a GC to keep prior queries' blocks from
      // occupying storage memory during this query's runs
      System.gc()
      // the headline query gets 7 timed passes (r9 verdict item 8: its
      // median-of-5 drifted 22% above a simultaneously-IMPROVED min —
      // session noise; a median over 7 tolerates three stalled passes)
      val iters = if (name == HeadlineQuery) HeadlineIters else Iters
      val warmOk = force(name)
      val times =
        if (!warmOk) Seq.empty[Double]
        else (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          val ok = force(name)
          if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
        }
      // a failed query must not masquerade as a (near-zero) fast timing
      if (times.isEmpty || times.exists(_.isNaN)) name -> (-1.0, -1.0)
      else name -> (median(times), times.min)
    }
    // r13 verdict item 1: the ETL leg can self-attribute host-CPU-steal
    // drift (etl_steal_s) but the query legs could not — the committed r13
    // plain total (+15% vs r12, broadly uniform per query) was diagnosed
    // environmental only via UNCOMMITTED in-round probes
    // (r13_bench_contention). Sample /proc/stat steal around each query leg
    // too, so any future drift self-attributes in the committed artifact:
    // steal_plain_s / steal_bucketed_s ≈ 0 means the medians are
    // trustworthy; a large value explains a uniformly-slow leg.
    val stealPlainBefore = stealJiffies
    val results = timeLeg()
    val stealPlainS = (stealJiffies - stealPlainBefore) / 100.0
    spark.sharedState.cacheManager.clearCache()

    // ---- bucketed leg (r12 verdict item 4) --------------------------------
    // At 100 TB the bucketed layout IS the intended at-rest configuration
    // for the star workload, so its trend must be committed per round, not
    // measured once: the SAME query list re-timed under the 'orderkey'
    // layout (orders/lineitem bucketed by orderkey, customer by custkey —
    // Tables scaladoc), tables freshly rewritten each run (untimed; a
    // stale copy of a regenerated corpus would silently serve old rows).
    // Queries not touching the three star tables resolve identically in
    // both legs, which keeps total_bucketed directly comparable to total.
    // Skipped only when the driver already pinned a layout via env (then
    // this run IS that layout's leg).
    val BucketedLayout = "orderkey"
    val stealBkBefore = stealJiffies
    val bucketedResults: Option[Seq[(String, (Double, Double))]] =
      if (Tables.activeLayout.isDefined) None
      else {
        try {
          tools.BenchTune.writeBucketedTables(spark, sfDir, BucketedLayout)
          System.setProperty("graft.bucketed", BucketedLayout)
          try Some(timeLeg())
          finally System.clearProperty("graft.bucketed")
        } catch { case e: Throwable =>
          System.clearProperty("graft.bucketed")
          System.err.println(s"[bench] bucketed leg failed: ${e.getMessage}")
          None
        }
      }
    val stealBkS = (stealJiffies - stealBkBefore) / 100.0
    spark.sharedState.cacheManager.clearCache()

    def fmt(rs: Seq[(String, (Double, Double))],
        sel: ((Double, Double)) => Double): String =
      rs.map { case (k, v) => "\"" + k + f"""\":${sel(v)}%.4f""" }
        .mkString("{", ",", "}")
    val qJson = fmt(results, _._1)
    val qMinJson = fmt(results, _._2)
    val nFailed = results.count(_._2._1 < 0)
    // A failed query silently SHRINKS the summed workload, making the
    // headline total read as an improvement over prior rounds (r11: t4
    // failed, total covered 8 queries vs r9's 9). Only publish a total
    // from a clean run; otherwise emit the failure sentinel and a
    // machine-visible comparability flag.
    val total =
      if (nFailed > 0) -1.0 else results.map(_._2._1).sum
    // the bucketed leg carries the same failure discipline: a missing leg
    // (env-pinned layout or write failure) publishes sentinel fields so
    // the round-over-round trend shows a GAP, never a silent improvement
    val nFailedBk = bucketedResults.map(_.count(_._2._1 < 0)).getOrElse(-1)
    val totalBk = bucketedResults match {
      case Some(rs) if nFailedBk == 0 => rs.map(_._2._1).sum
      case _ => -1.0
    }
    val qBkJson = bucketedResults.map(fmt(_, _._1)).getOrElse("{}")
    val qBkMinJson = bucketedResults.map(fmt(_, _._2)).getOrElse("{}")
    val comparable = nFailed == 0
    val comparableBk = nFailedBk == 0

    // etl_protocol tag: r9 changed the ETL leg (isolated, 2 warmups,
    // 400 logs, median-of-5) — absolute logs/s moved up ~1.7x vs the old
    // 200-log median-of-3 because fixed per-load overhead amortizes over
    // longer runs; compare etl numbers only within the same etl_protocol.
    // layout tag: "plain" unless an opt-in bucketed at-rest layout is
    // active (Tables scaladoc) — bucketed totals are a different storage
    // contract, never compared against plain ones silently
    val layout = Tables.activeLayout.getOrElse("plain")
    println(f"""{"metric":"total","value":$total%.4f,"unit":"sec","protocol":"noop-sink","etl_protocol":"first-400-med5","layout":"$layout","comparable_with_prior":$comparable,"queries":$qJson,"queries_min":$qMinJson,"iters":$Iters,"iters_q1":$HeadlineIters,"failed":$nFailed,"layout_bucketed":"$BucketedLayout","total_bucketed":$totalBk%.4f,"comparable_with_prior_bucketed":$comparableBk,"queries_bucketed":$qBkJson,"queries_bucketed_min":$qBkMinJson,"failed_bucketed":$nFailedBk,"etl_logs_per_sec":$etlLogsPerSec%.1f,"etl_logs_per_sec_best":$etlLogsPerSecBest%.1f,"etl_steal_s":$etlStealS%.1f,"steal_plain_s":$stealPlainS%.1f,"steal_bucketed_s":$stealBkS%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
