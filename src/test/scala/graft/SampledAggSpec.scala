package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the x_sampled_agg Horvitz-Thompson estimator
  * (Analytics.scala) — the "aggregate 100 TB by reading 1/16th" primitive:
  *  - DETERMINISTIC SAMPLE: the md5-nibble inclusion decision is a pure
  *    function of the row key, so the estimate is invariant under any
  *    repartitioning (at scale: the same rows are sampled no matter how
  *    the corpus is sharded, and a persisted sample partition equals an
  *    on-the-fly one);
  *  - UNBIASED-IN-EXPECTATION, BOUNDED-IN-REALIZATION: on xxhash-derived
  *    synthetic groups (data the gate never sees) every group's realized
  *    |est−exact|/exact stays within 6·CV where CV = sqrt((1−p)/(p·n))
  *    — generous enough to be deterministic-stable, tight enough that a
  *    broken indicator (p drift, double-count, missed rows) reddens it;
  *  - ONE-PASS TWIN ARMS: exact and estimated arms ride the SAME
  *    aggregate — exactly one shuffle in the plan, because at 100 TB the
  *    whole point is not paying a second scan to audit the estimator.
  */
class SampledAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("sample decision is partitioning-invariant (bit-identical output)") {
    val base = queries.Analytics.defs.find(_.name == "x_sampled_agg").get
    val a = base.run(spark, sfDir).collect().map(_.toString).toSeq
    // same query over an adversarially re-sharded scan: resolve the table,
    // repartition, and recompute the identical expression chain
    val li = Tables.lineitem(spark, sfDir).repartition(7, $"l_partkey")
    val keyNib = substring(
      md5(concat_ws("_", $"l_orderkey", $"l_linenumber")), 1, 1)
    val inSample = when(keyNib === "0", 1L).otherwise(0L)
    val qtyDec = $"l_quantity".cast("decimal(18,2)")
    val zeroDec = lit(0).cast("decimal(18,2)")
    val b = li.groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_exact"),
        (sum(inSample) * 16).as("n_est"),
        sum(qtyDec).cast("double").as("sum_qty_exact"),
        (sum(when(inSample === 1L, qtyDec).otherwise(zeroDec)) * 16)
          .cast("double").as("sum_qty_est"))
      .withColumn("rel_err_pct",
        round(abs($"sum_qty_est" - $"sum_qty_exact")
          / $"sum_qty_exact" * 100, 2))
      .withColumn("in_bound", $"rel_err_pct" <= 25.0)
      .orderBy($"l_returnflag")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("realized error within 6×CV on synthetic groups the gate never sees") {
    val p = 1.0 / 16.0
    // 8 groups × ~25k rows of deterministic pseudo-random values 1..1000
    val df = spark.range(200000).select(
      (col("id") % 8).cast("string").as("g"),
      col("id").as("k"),
      (pmod(xxhash64(col("id"), lit(11)), lit(1000L)) + 1L).as("v"))
    val nib = substring(md5(col("k").cast("string")), 1, 1)
    val inS = when(nib === "0", 1L).otherwise(0L)
    val rows = df.groupBy($"g")
      .agg(count(lit(1)).as("n"),
        sum(inS).as("n_s"),
        sum($"v").as("exact"),
        (sum(when(inS === 1L, $"v").otherwise(0L)) * 16).as("est"))
      .collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val n = r.getLong(1); val nS = r.getLong(2)
      val exact = r.getLong(3).toDouble; val est = r.getLong(4).toDouble
      // sampled count itself within 6·CV of p·n
      val cv = math.sqrt((1 - p) / (p * n))
      assert(math.abs(nS - p * n) / (p * n) <= 6 * cv,
        s"group ${r.getString(0)}: sampled $nS of $n (p·n=${p * n})")
      assert(math.abs(est - exact) / exact <= 6 * cv,
        s"group ${r.getString(0)}: est $est exact $exact cv $cv")
    }
  }

  test("twin arms ride one shuffle (single Exchange in the plan)") {
    val base = queries.Analytics.defs.find(_.name == "x_sampled_agg").get
    val plan = base.run(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    // one hashpartitioning exchange for the groupBy; the orderBy on 3 rows
    // may add a range exchange — but the AGGREGATE must not need more
    assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n$plan")
    assert(plan.contains("partial"),
      "expected map-side partial aggregation in the plan")
  }
}
