package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RAW-estimate branch under load. Every gate-scale window lands in
  * the linear-counting regime (window cardinality ≪ 5m/2), so the gates
  * prove the raw-branch ARITHMETIC hash-exact (hll_raw is an output
  * column) but never SELECT it as the estimate. This spec drives both
  * numerator paths through the selection at real cardinality:
  *
  *  - m = 1024 (Long numerator): 50k distinct keys in one window —
  *    est_raw ≫ 5m/2, the CASE must pick hll_raw, and the estimate must
  *    land inside the 5·rsd ≈ 16% envelope;
  *  - m = 2^14 (DECIMAL(38,0) numerator — the r16 wide-integer path):
  *    200k distinct keys, envelope 5·rsd ≈ 4%.
  *
  * Both checks are DETERMINISTIC: the key sets are fixed, md5 is a pure
  * function, so these are regression pins, not statistical tests. */
class HllRawSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("high cardinality selects the raw branch within the rsd envelope " +
      "on both the Long and the wide-integer numerator paths") {
    for ((p, n) <- Seq((Hll.Default, 50000L), (Hll.Hi, 200000L))) {
      val ev = spark.range(n).select(
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("w_start"),
        col("id").cast("string").as("key"))
      val row = Hll.estimate(Hll.cells(ev, col("key"), p), p).head()
      val raw = row.getAs[Long]("hll_raw")
      val est = row.getAs[Long]("hll_est")
      assert(raw > p.lcThreshold,
        s"m=${p.m}: n=$n did not exceed the linear-counting threshold " +
          s"(raw=$raw, threshold=${p.lcThreshold}) — the branch is untested")
      assert(est == raw,
        s"m=${p.m}: the CASE must select the raw estimate at raw=$raw")
      val errPpm = math.abs(est - n) * 1000000L / n
      assert(errPpm <= p.boundPpm,
        s"m=${p.m}: est=$est for n=$n — error ${errPpm}ppm exceeds the " +
          s"5·rsd envelope ${p.boundPpm}ppm")
    }
  }
}
