package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Boundary-guarded fixed-point rounding for transcendental-derived
  * columns (r13 verdict item 8).
  *
  * The hash-exact gate family rounds pow()/ln() results into integer
  * fixed point so both engines agree bit-for-bit. That collapses
  * cross-engine libm ulp drift EXCEPT when a value lands within an ulp
  * or two of a `.5` rounding boundary — there, JVM `Math.pow`/`log` and
  * DuckDB's libm can round the long to different integers, a
  * data-dependent flake that would surface as an inscrutable hash
  * mismatch. This helper makes that failure mode SELF-DIAGNOSING: before
  * rounding, it measures the distance from the pre-round value to the
  * nearest `.5` boundary and raises a named error if the distance is
  * inside the 2-ulp danger band, so a future corpus that trips the risk
  * fails loudly with the cause in the message instead of reddening a
  * gate with a bare hash diff.
  *
  * False-trip budget: the band is |raw|·2^-51 wide, so the chance a
  * benign value lands inside it is ~|raw|·2^-51 per row — ~1e-9 at the
  * 1e6-scale fixed points this guards (x_temperature_mix w_fp,
  * x_dsir_weights model fx). Guard only transcendental-derived rounds;
  * rounds of exact-integer-derived doubles (ratios of longs) are
  * bit-identical across engines and need no guard.
  */
object FixedPoint {

  /** `round(raw).cast(long)`, failing loudly if `raw` sits within 2 ulps
    * of a `k + 0.5` rounding boundary (the only place cross-engine libm
    * ulp drift can flip the fixed point). `label` names the query/column
    * in the error so a gate failure self-diagnoses.
    *
    * Band shape: the relative 2-ulp width |raw|·2^-51 saturates past
    * |raw| ≈ 2^50 (it would exceed the maximum possible boundary distance
    * of 0.5 and trip EVERY row), so the band is capped at 0.25; and at
    * |raw| ≥ 2^52 a double has no fractional part at all — rounding is
    * exact by construction on both engines — so the guard is skipped
    * entirely there. */
  def guardedRound(raw: Column, label: String): Column = {
    val frac = raw - floor(raw)
    val dist = abs(frac - lit(0.5))
    // 2 ulps of raw, computed relatively: ulp(x) ≈ |x|·2^-52; capped so
    // the band can never cover the whole [0, 0.5] distance range.
    val tol = least(abs(raw) * lit(math.pow(2.0, -51)), lit(0.25))
    val exactByMagnitude = abs(raw) >= lit(math.pow(2.0, 52))
    when(!exactByMagnitude && dist < tol, raise_error(
      lit(s"$label: fixed-point pre-round value within 2 ulp of a .5 " +
        "rounding boundary — cross-engine pow/ln ulp drift could flip " +
        "this long on one engine only; widen the fixed-point quantum " +
        "or gate this row rows-only for this corpus")))
      .otherwise(round(raw, 0).cast("long"))
  }

  /** Domain guard for the power-of-two quantile-sketch bucketing, which
    * is only defined for v ≥ 1: `bin(0)` has length 1 (divides the
    * rel-err audit column by exact_cents = 0) and a NEGATIVE v makes
    * Spark's `div` (truncates toward zero) disagree with DuckDB's `//`
    * (floors) — a cross-engine hash mismatch waiting for the first
    * corpus with non-positive event values. Mirrors Bpe's boundary-char
    * guard: fail loudly with the cause named instead of reddening a gate
    * with a bare hash diff. */
  def requirePositive(v: Column, label: String): Column =
    when(v < lit(1L), raise_error(
      lit(s"$label: quantile-sketch bucketing requires v >= 1 " +
        "(v=0 breaks the rel-err audit; v<0 makes Spark div and DuckDB " +
        "// disagree) — filter or shift the value domain first")))
      .otherwise(v)

  /** The v ≥ 0 form, for sketch sites WITHOUT a division by the value
    * (the windowed gate's in_bound is a multiply; the streaming store
    * never divides): v = 0 is a perfectly well-defined bucket — bin(0)
    * has length 1 on both engines, so p = 1 and lb = 0, identically —
    * and real event corpora DO carry zero values (sf0.1: 1904 of 100k
    * events; the r15 sweep caught requirePositive reddening exactly
    * that). Only NEGATIVE v is undefined territory: Spark's `div`
    * truncates toward zero while DuckDB's `//` floors, so the bucket
    * assignment itself would disagree cross-engine — raise loudly. */
  def requireNonNegative(v: Column, label: String): Column =
    when(v < lit(0L), raise_error(
      lit(s"$label: quantile-sketch bucketing requires v >= 0 " +
        "(negative v makes Spark div and DuckDB // disagree on the " +
        "bucket itself) — filter or shift the value domain first")))
      .otherwise(v)
}
