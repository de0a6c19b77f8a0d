package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed two-phase prefix sum must equal the single-partition
  * window form at ANY partition count — that equality is what lets
  * x_spearman's rank derivation claim "no single-partition stage" without
  * changing its oracle.
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches the single-window form at 1, 3, and 32 partitions") {
    // unique keys in scrambled order, lumpy values
    val rows = (0 until 500).map(i => ((i * 7919) % 5003, (i % 13).toLong + 1))
    val df = rows.toDF("k", "v")
    val expected = df
      .withColumn("cumb", coalesce(sum($"v").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"k", $"cumb")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (n <- Seq(1, 3, 32)) {
      val got = PrefixSum.exclusivePrefixSum(df, "k", "v", "cumb", n)
        .select($"k", $"cumb")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == expected, s"numPartitions=$n diverged")
    }
  }

  test("refuses input that already carries an internal scratch column") {
    // r13 ADVICE: withColumn would silently overwrite a caller's __pid /
    // __cum_in / __offset and then drop it — must fail loudly instead
    val df = Seq((1, 1L, 9L)).toDF("k", "v", "__pid")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.exclusivePrefixSum(df, "k", "v", "c", 4)
    }
    assert(e.getMessage.contains("__pid"))
  }

  test("first row gets 0; total order is honored across partition bounds") {
    val df = (1 to 100).map(i => (i, 1L)).toDF("k", "v")
    val out = PrefixSum.exclusivePrefixSum(df, "k", "v", "c", 8)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert((1 to 100).forall(i => out(i) == (i - 1).toLong))
  }
}
