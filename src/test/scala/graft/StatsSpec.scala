package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic property pins for the round-13 statistics family — the
  * invariances oracle parity cannot express (the oracle mirrors the same
  * formula, so a formula error would pass the gate; these tests check the
  * formulas against what the STATISTIC is supposed to do).
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the x_corr_matrix / x_spearman assembly, factored for direct testing
  private def pearson(xs: Seq[Double], ys: Seq[Double]): Double = {
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("spearman: rho = 1 for any strictly monotonic transform") {
    // ranks of x and of x³+7 are identical — Spearman must see 1.0 even
    // though Pearson on the raw values would not
    val xs = Seq(3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3)
    val ys = xs.map(x => x * x * x + 7)
    def ranks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted.zipWithIndex.map { case (x, i) => x -> (i + 1.0) }
        .groupBy(_._1).map { case (x, g) =>
          x -> g.map(_._2).sum / g.length }
      v.map(sorted)
    }
    assert(math.abs(pearson(ranks(xs), ranks(ys)) - 1.0) < 1e-12)
    assert(pearson(xs, ys) < 0.999) // raw Pearson genuinely differs
  }

  test("MAD center/spread ignore a wild outlier; z-score moments do not") {
    val clean = (1 to 99).map(_.toDouble)
    val dirty = clean :+ 1e9
    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val (mc, md) = (median(clean), median(dirty))
    val madC = median(clean.map(x => math.abs(x - mc)))
    val madD = median(dirty.map(x => math.abs(x - md)))
    // one wild point barely moves the robust stats...
    assert(math.abs(mc - md) <= 1.0 && math.abs(madC - madD) <= 1.0)
    // ...but shifts the mean by ~1e7 (what x_outlier_zscore would feel)
    val shift = dirty.sum / dirty.length - clean.sum / clean.length
    assert(shift > 1e6)
  }

  test("x_mad_outliers: planted extreme events are counted, gate-shaped") {
    // run the DECLARED query on the real corpus and check its contract:
    // every group's n_outliers is consistent with a direct recount
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x_mad_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    rows.foreach { r =>
      val (g, med, mad, nOut) =
        (r.getString(0), r.getDouble(2), r.getDouble(3), r.getLong(4))
      val direct = ev.filter(_._1 == g)
        .count { case (_, v) => math.abs(v - med) > 3 * mad }
      assert(direct.toLong == nOut, s"group $g recount mismatch")
    }
  }

  test("chi2: independent uniform cells give ~0; dependent cells do not") {
    def chi2(cells: Map[(Int, Int), Long]): Double = {
      val n = cells.values.sum.toDouble
      val rt = cells.groupBy(_._1._1).map { case (r, g) => r -> g.values.sum }
      val ct = cells.groupBy(_._1._2).map { case (c, g) => c -> g.values.sum }
      cells.map { case ((r, c), o) =>
        val e = rt(r) * ct(c) / n
        (o - e) * (o - e) / e
      }.sum
    }
    val indep = (for { r <- 0 until 3; c <- 0 until 2 }
      yield (r, c) -> 100L).toMap
    val dep = Map((0, 0) -> 200L, (0, 1) -> 0L, (1, 0) -> 0L, (1, 1) -> 200L)
    assert(chi2(indep) == 0.0)
    assert(chi2(dep) > 100.0)
  }

  test("equi-depth histogram: bucket sizes within rounding of n/10") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("a12_equidepth_histogram")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = rows.values.sum
    assert(rows.size == 10)
    // boundary-tie mass can unbalance buckets, but with a continuous
    // value column every decile must hold n/10 ± 2%
    assert(rows.values.forall(c =>
      math.abs(c - n / 10.0) <= n * 0.02), rows.toSeq.sorted)
  }
}
