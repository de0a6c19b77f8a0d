package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** guardedRound (r13 verdict item 8) pins the transcendental tie-boundary
  * risk class: values safely away from a .5 boundary round exactly like
  * round().cast(long); a value manufactured INSIDE the 2-ulp danger band
  * fails loudly with the self-diagnosing message instead of surfacing
  * later as a cross-engine hash mismatch.
  */
class FixedPointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rounds like round().cast(long) away from boundaries") {
    val vals = Seq(0.0, 1.2345e6, -7.89e5, 42.4999, 42.5001, -3.4999)
    val got = vals.toDF("x")
      .select(FixedPoint.guardedRound($"x", "spec").as("r"))
      .collect().map(_.getLong(0)).toSeq
    val want = vals.toDF("x")
      .select(round($"x", 0).cast("long").as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("a value within 2 ulp of a .5 boundary fails loudly and self-names") {
    // 1e6 + 0.5 + ~1 ulp of 1e6 (~1.16e-10): inside the |x|·2^-51 band
    val danger = 1.0e6 + 0.5 + java.lang.Math.ulp(1.0e6)
    val e = intercept[Exception] {
      Seq(danger).toDF("x")
        .select(FixedPoint.guardedRound($"x", "spec_danger").as("r"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m =>
      m.contains("spec_danger") && m.contains(".5")))
  }

  test("an exact .5 boundary from integer-derived doubles still rounds") {
    // dist == tol at frac exactly .5? dist = 0 < tol → this SHOULD trip:
    // an exactly-.5 transcendental result is the maximal-risk case
    val e = intercept[Exception] {
      Seq(7.5).toDF("x")
        .select(FixedPoint.guardedRound($"x", "spec_half").as("r"))
        .collect()
    }
    assert(e != null)
  }
}
