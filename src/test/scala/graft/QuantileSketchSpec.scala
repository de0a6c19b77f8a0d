package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic property pins for the HdrHistogram-style quantile sketch
  * behind x_quantile_sketch (r13 verdict item 6), on data the gate never
  * sees (deterministic pseudo-random longs spanning 5 decades):
  *  - ONE-SIDED: the sketch estimate never exceeds the exact
  *    percentile_disc value (the CMS overcount analog);
  *  - BOUNDED: relative error < 2^-5 at every probed quantile (theorem:
  *    the exact value lies in the estimate's power-of-two bucket);
  *  - MERGEABLE: the sketch of A ∪ B equals the cell-wise sum of the
  *    sketches of A and B — the property that gives windowed/at-rest
  *    quantiles by count addition.
  */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // xxhash-derived positive values spanning ~1..1e5 (5 binary decades mix)
  private def vals(n: Int, seed: Int) =
    spark.range(n).select(
      (pmod(xxhash64(col("id"), lit(seed)), lit(100000L)) + 1L).as("v"))

  private def lb(c: org.apache.spark.sql.Column) = {
    expr("(v div shiftleft(cast(1 as bigint), greatest(length(bin(v)) - 6, 0)))" +
      " * shiftleft(cast(1 as bigint), greatest(length(bin(v)) - 6, 0))")
  }

  test("one-sided and bounded at every probed quantile") {
    val df = vals(20000, 7)
    val sk = df.select(lb($"v").as("lb")).groupBy($"lb")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(Window.orderBy($"lb")))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val sorted = df.orderBy($"v").collect().map(_.getLong(0))
    val n = sorted.length
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val target = math.ceil(q * n).toLong
      val est = sk.find(_._2 >= target).get._1
      val exact = sorted((target - 1).toInt)
      assert(est <= exact, s"q=$q est=$est exact=$exact not one-sided")
      assert((exact - est).toDouble / exact < 1.0 / 32,
        s"q=$q rel err ${(exact - est).toDouble / exact} out of bound")
    }
  }

  test("sketches merge by cell-wise count addition") {
    val a = vals(5000, 1); val b = vals(5000, 2)
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.select(lb($"v").as("lb")).groupBy($"lb")
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val merged = {
      val sa = sketch(a); val sb = sketch(b)
      (sa.keySet ++ sb.keySet).map(k =>
        k -> (sa.getOrElse(k, 0L) + sb.getOrElse(k, 0L))).toMap
    }
    assert(sketch(a.union(b)) == merged)
  }

  test("sketch footprint is bounded regardless of input size") {
    // 64 exponents x 32 sub-buckets is the hard ceiling; on 5 decades of
    // data the realized footprint is far below even that
    val n = vals(50000, 3).select(lb($"v").as("lb")).distinct().count()
    assert(n <= 64 * 32, s"sketch has $n cells")
  }
}
