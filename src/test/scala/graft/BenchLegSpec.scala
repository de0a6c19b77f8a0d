package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench's attempt-cleanliness arithmetic (ROUND-20
  * protocol) — the rules that decide whether the committed artifact's
  * absolutes can be trusted. These are pure functions; live behavior
  * (retry, wait-for-quiet, second chance) is exercised end-to-end by
  * Bench runs, but the BOUNDARIES live here so a threshold edit that
  * silently flips certification semantics turns a test red.
  *
  *  - clean = steal ≤ 2.0 s AND other-process CPU rate ≤ 0.25 cpu
  *    (both inclusive — an attempt exactly at a threshold passes);
  *  - score = steal seconds + other-CPU seconds IN EXCESS of the clean
  *    allowance (0.25 × wall): attempts inside both thresholds score
  *    near zero, contamination of either kind adds its full measured
  *    seconds, so minBy(score) picks the least-contaminated attempt
  *    even when none is clean;
  *  - a zero-wall read (defensive) has rate 0, never NaN/Infinity.
  */
class BenchLegSpec extends AnyFunSuite {

  private def leg(steal: Double, other: Double, wall: Double) =
    Bench.LegRead((), steal, other, wall, Seq(steal),
      Seq(if (wall > 0) other / wall else 0.0))

  test("clean requires BOTH signals inside thresholds, inclusive") {
    assert(leg(2.0, 0.0, 60).clean, "steal exactly at 2.0 s is clean")
    assert(!leg(2.01, 0.0, 60).clean, "steal above 2.0 s is dirty")
    assert(leg(0.0, 15.0, 60).clean, "other rate exactly 0.25 is clean")
    assert(!leg(0.0, 15.1, 60).clean, "other rate above 0.25 is dirty")
    assert(!leg(5.0, 30.0, 60).clean)
    // the r19 blind spot: ZERO steal with a second JVM burning a core
    assert(!leg(0.0, 60.0, 60).clean,
      "zero-steal in-guest contention must read dirty (other rate 1.0)")
  }

  test("score orders attempts by total contamination, both kinds") {
    // inside both thresholds: only the steal term remains
    assert(leg(0.5, 10.0, 60).score === 0.5)
    // other-CPU counts only ABOVE the allowance (0.25 x wall = 15 s)
    assert(math.abs(leg(0.0, 25.0, 60).score - 10.0) < 1e-9)
    // both kinds add
    assert(math.abs(leg(3.0, 25.0, 60).score - 13.0) < 1e-9)
    // a dirty-steal/quiet-guest attempt loses to clean-steal/busy-guest
    // when the guest excess is smaller than the steal gap
    val stealDirty = leg(10.0, 0.0, 60)
    val guestBusy = leg(0.0, 18.0, 60) // 3 s excess
    assert(guestBusy.score < stealDirty.score)
  }

  test("otherRate is total-order-safe on degenerate walls") {
    assert(leg(0.0, 5.0, 0.0).otherRate == 0.0)
    assert(leg(0.0, 5.0, 0.0).clean)
  }

  test("metric line fits the driver tail window as fields accumulate " +
      "(r21, r20 verdict item 2a)") {
    // budget arithmetic: 2000-char tail window minus sbt's success line
    assert(Bench.metricLineBudget ==
      Bench.TailWindowChars - Bench.SbtSuccessLineChars)
    assert(Bench.SbtSuccessLineChars >= 75,
      "success-line allowance must cover the observed ~73-75 chars + LF")
    // ground truth: the LATEST committed artifact's metric line, plus the
    // worst-case rendering of every field added since, must still fit.
    // This turns field accumulation into a red test BEFORE a run truncates.
    val benches = new java.io.File(".").listFiles()
      .filter(f => f.getName.matches("BENCH_r\\d+\\.json")).sortBy(_.getName)
    assume(benches.nonEmpty)
    val txt = scala.io.Source.fromFile(benches.last).mkString
    val lineStart = txt.indexOf("{\\\"metric\\\":\\\"total\\\"")
    if (lineStart >= 0) {
      val lineEnd = txt.indexOf("\\n", lineStart)
      // the tail field is JSON-escaped — unescape \" before measuring,
      // or every quote counts twice and the budget check overstates.
      // Model the r21 emission on that round's data: bench_n /
      // bench_n_bucketed moved to the detail line (re-derivable from the
      // map sizes), so strip them if the artifact predates the move.
      val asEmitted = txt
        .substring(lineStart, if (lineEnd > lineStart) lineEnd else txt.length)
        .replace("\\\"", "\"")
        .replaceAll(""""bench_n":\d+,""", "")
        .replaceAll(""""bench_n_bucketed":\d+,""", "")
        // strip the r21 fields an r21+ artifact already carries, so the
        // worst-case widths below are not double-counted against it
        .replaceAll(""","second_chance":\d+""", "")
        .replaceAll(""","att":\[[^\]]*\]""", "")
        .replaceAll(""","signal_ok":(true|false)""", "")
        // model the r22 emission: comparable_with_prior_bucketed moved
        // to the detail line (strip it from pre-r22 artifacts), and the
        // x_kmv_onepass bucketed entries joined (strip from r22+
        // artifacts, re-added at worst-case width below)
        .replaceAll(""","comparable_with_prior_bucketed":(true|false)""", "")
        .replaceAll(""","x_kmv_onepass":-?\d+(\.\d+)?""", "")
      // worst realistic widths for the r21 fields: second_chance ≤ 6
      // (3 legs × ≤ 2 passes), att counts ≤ 12 (6 attempts + 2 × 3
      // second-chance attempts), signal_ok only in the rare no-data case
      val worstNewFields =
        ""","second_chance":6,"att":[12,12,12,12],"signal_ok":false""".length
      // the r22 bucketed entries, med + min maps, at failure-sentinel or
      // two-digit width
      val worstOnepass = 2 * ""","x_kmv_onepass":99.999""".length
      assert(asEmitted.length + worstNewFields + worstOnepass <=
          Bench.metricLineBudget,
        s"metric line modeled at ${asEmitted.length} chars + worst-case " +
          s"r21/r22 fields (${worstNewFields + worstOnepass}) exceeds " +
          s"${Bench.metricLineBudget}")
    }
  }
}
