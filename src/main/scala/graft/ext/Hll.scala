package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality as relational algebra, parameterized by the
  * register count `m` — ONE definition of the bucketing, the register
  * update, and the integer estimate pipeline, consumed by the batch gate
  * (`x_hll_window`), the streaming twin ([[graft.streaming.HllStream]]),
  * and the mechanically generated DuckDB oracle, so the three can never
  * drift (r14 verdict item 5: m = 64 gave rsd ≈ 13% and a 40% `in_bound`
  * that certified little; the gate now runs m = 1024 → rsd ≈ 3.25% and a
  * 5·rsd ≈ 16% bound that actually constrains the estimate).
  *
  * ==The integer discipline==
  * Everything — INCLUDING the estimate — is exact integer arithmetic on
  * both engines, so the gate is hash-exact and a sketch outlier cannot
  * flake it (the a8 weakness this form retires):
  *
  *  - hash: md5 of the key, top 64 bits, shifted right 4 → a 60-bit
  *    value `h` both engines derive identically (`md5_number_upper` /
  *    the native Md5Hash64 expression);
  *  - bucket = h mod m; rho = position of the leftmost 1-bit of the
  *    remaining (60−p)-bit word w = h div m, computed WITHOUT any bit
  *    intrinsic as (61−p) − length(bin(w)) — `bin` prints no leading
  *    zeros on either engine (w = 0, probability 2^−(60−p), lands on
  *    rho = 60−p: one unit below the true convention's cap, identically
  *    on both engines — the determinism, not the unit, is the contract);
  *  - register merge = per-bucket MAX (idempotent + commutative — the
  *    property the streaming store leans on: even out-of-protocol
  *    reprocessing cannot inflate a max);
  *  - the raw estimate α·m²/Σ2^−rho is carried with Σ2^−rho in 1e−12
  *    units: numerator round(α·1e6)·m²·1e6 stays Long-safe through
  *    m = 2048 (α·m²·1e12 ≈ 3.0e18 there; m = 4096 hits 1.2e19 > 2^63),
  *    past which BOTH engines switch to an exact wide integer —
  *    DECIMAL(38,0) on Spark, HUGEINT on DuckDB — so m = 2^14
  *    (rsd 0.81%, the production register count) is admitted with the
  *    same exact integer `div` on both engines (r15 verdict item 2);
  *  - the small-range linear-counting branch needs ln(m/V), which has
  *    only m possible values: they are inlined as SHARED LITERAL
  *    CONSTANTS computed once here and embedded in BOTH plans — no
  *    runtime transcendental anywhere, none of the tie-boundary risk
  *    class.
  *
  * ==Scale shape==
  * One map-side-combined groupBy to ≤ m cells per window; the estimate
  * reads cell rows only. m = 1024 cells/window × 12 bytes is still KB-
  * scale state per window at any corpus size — the whole point of HLL.
  */
object Hll {

  /** round(1e6·α_m). Flajolet et al. 2007 specify DISCRETE constants for
    * the two smallest register counts (α_16 = 0.673, α_32 = 0.697) and
    * the asymptotic formula 0.7213/(1 + 1.079/m) from m = 64 up — the
    * formula overestimates α by ~0.4% at m = 16/32, so the paper's
    * constants are honored there (r15 ADVICE). m = 64 keeps the formula
    * value the legacy gate shipped hard-coded: 709341. */
  def alphaE6(m: Int): Long = m match {
    case 16 => 673000L
    case 32 => 697000L
    case _  => math.round(1e6 * 0.7213 / (1 + 1.079 / m))
  }

  /** All derived constants for one register count. m up to 2048 keeps
    * the whole estimate numerator α·m²·1e12 inside Long and both plans
    * use plain BIGINT literals; m above that (production cardinality
    * work wants m = 2^14 → rsd 0.81%) switches BOTH engines to an exact
    * wide-integer numerator — DECIMAL(38,0) on Spark, HUGEINT on DuckDB
    * — with the SAME integer `div`, so the no-drift property survives
    * the Long cap (r15 verdict item 2). */
  final case class Params(m: Int) {
    require(m >= 16 && m <= 16384 && (m & (m - 1)) == 0,
      s"m must be a power of two in [16, 16384], got $m")
    /** log2(m): bucket bits. */
    val p: Int = Integer.numberOfTrailingZeros(m)
    /** rho = rhoBase − length(bin(h div m)) for the 60-bit md5-derived h. */
    val rhoBase: Int = 61 - p
    /** est_raw = numeratorBig div Σ(1e12 >> rho): α·m² with the Σ in
      * 1e−12 units folded in. Exact at every admitted m (BigInt). */
    val numeratorBig: BigInt =
      BigInt(alphaE6(m)) * m * m * 1000000L
    /** True when the numerator fits Long (m ≤ 2048) — both plans then
      * keep the historical plain-BIGINT literal, bit-identical to the
      * pre-r16 pins; above it the DECIMAL/HUGEINT path engages. */
    val numeratorLongSafe: Boolean = numeratorBig.isValidLong
    /** The legacy Long numerator — only meaningful when
      * [[numeratorLongSafe]]; accessing it past the cap fails loudly. */
    def numerator: Long = {
      require(numeratorLongSafe,
        s"numerator ${numeratorBig} exceeds Long at m=$m — use numeratorBig")
      numeratorBig.toLong
    }
    /** Linear counting applies when est_raw ≤ 5m/2 and empty buckets
      * exist (the standard small-range correction). */
    val lcThreshold: Long = m.toLong * 5L / 2L
    /** lut(V−1) = round(m·ln(m/V)) for V = 1..m — the linear-counting
      * estimate as a pure integer table shared by both engines. */
    val lut: IndexedSeq[Long] =
      (1 to m).map(v => math.round(m * math.log(m.toDouble / v)))
    /** in_bound threshold: 5·rsd = 5·1.04/√m, in ppm. */
    val boundPpm: Long = math.round(5.0 * 1.04 / math.sqrt(m) * 1e6)
  }

  val Default: Params = Params(1024)

  /** The production register count (Heule et al.'s HLL++ default
    * precision 14): rsd ≈ 1.04/√16384 ≈ 0.81%, 5·rsd bound ≈ 4%. Rides
    * the wide-integer numerator path (DECIMAL(38,0) / HUGEINT) past the
    * m = 2048 Long cap — the `x_hll_window_hi` gate, the merge law, and
    * the streaming store all run here (r15 verdict item 2). */
  val Hi: Params = Params(16384)

  // ---- Spark side ---------------------------------------------------------

  /** (w_start, bucket, rho) register cells for a frame of
    * (w_start, key STRING-castable) rows — max-merged per bucket. */
  def cells(frame: DataFrame, key: Column, P: Params = Default): DataFrame = {
    import graft.functions.Md5Hash64.md5_le64
    frame
      .withColumn("h", shiftrightunsigned(md5_le64(key.cast("string")), 4))
      .select(col("w_start"), pmod(col("h"), lit(P.m.toLong)).as("bucket"),
        (lit(P.rhoBase) - length(expr(s"bin(h div ${P.m})"))).as("rho"))
      .groupBy(col("w_start"), col("bucket")).agg(max(col("rho")).as("rho"))
  }

  /** Per-window integer estimate off max-merged cells:
    * (w_start, n_present, v_zero, hll_raw, hll_est). */
  def estimate(cells: DataFrame, P: Params = Default): DataFrame =
    cells.groupBy(col("w_start")).agg(
        count(lit(1)).as("n_present"),
        sum(expr("shiftright(1000000000000L, rho)")).as("s_present"))
      .withColumn("v_zero", lit(P.m.toLong) - col("n_present"))
      .withColumn("s_total",
        col("s_present") + col("v_zero") * 1000000000000L)
      .withColumn("hll_raw",
        // past the Long cap the numerator rides as DECIMAL(38,0); `div`
        // is integral division on both integral and decimal inputs and
        // always lands in BIGINT — same exact quotient either way
        if (P.numeratorLongSafe)
          expr(s"${P.numerator} div greatest(s_total, 1)")
        else
          expr(s"CAST('${P.numeratorBig}' AS DECIMAL(38,0)) " +
            "div greatest(s_total, 1)"))
      .withColumn("hll_est",
        when(col("hll_raw") <= P.lcThreshold && col("v_zero") > 0,
          // ONE ArrayType literal (typedlit), not an m-child CreateArray
          // — at m = 16384 the per-element form would be a 16K-node
          // expression tree for what is a constant table
          element_at(typedlit(P.lut.toArray), col("v_zero").cast("int")))
          .otherwise(col("hll_raw")))
      .select(col("w_start"), col("n_present"), col("v_zero"),
        col("hll_raw"), col("hll_est"))

  // ---- DuckDB side (mechanically generated from the same Params) ----------

  /** Oracle CTEs from a CTE `<ev>(w_start, key_str)` to
    * `cells<p>(w_start, bucket, rho)` — the exact mirror of [[cells]],
    * name-prefixable so two independent cell derivations can coexist in
    * one query (the x_hll_merge gate). */
  def cellsSql(P: Params, p: String = "", ev: String = "ev"): String = {
    val m = P.m
    s"""hashed$p AS (
      SELECT w_start,
        CAST(md5_number_upper(key_str) >> 4 AS BIGINT) AS h
      FROM $ev),
    cells$p AS (
      SELECT w_start, h % $m AS bucket,
        MAX(${P.rhoBase} - length(bin(h // $m))) AS rho
      FROM hashed$p GROUP BY w_start, bucket)"""
  }

  /** Oracle CTEs from a cell relation `<cells>(w_start, bucket, rho)` to
    * `est3(w_start, n_present, v_zero, hll_raw, hll_est)` — the exact
    * mirror of [[estimate]]. */
  def estChainSql(P: Params, cells: String = "cells"): String = {
    val m = P.m
    val lut = P.lut.mkString("[", ", ", "]")
    // past the Long cap the numerator is an explicit HUGEINT (DuckDB's
    // exact 128-bit integer) — `//` stays exact integer division, the
    // twin of Spark's DECIMAL(38,0) div; CAST back to BIGINT so est3's
    // hll_raw has the same type either way
    val num =
      if (P.numeratorLongSafe) P.numerator.toString
      else s"CAST('${P.numeratorBig}' AS HUGEINT)"
    s"""est AS (
      SELECT w_start, COUNT(*) AS n_present,
        CAST(SUM(1000000000000 >> rho) AS BIGINT) AS s_present
      FROM $cells GROUP BY w_start),
    est2 AS (
      SELECT w_start, n_present, $m - n_present AS v_zero,
        CAST($num // greatest(
          s_present + ($m - n_present) * 1000000000000, 1) AS BIGINT)
          AS hll_raw
      FROM est),
    est3 AS (
      SELECT w_start, n_present, v_zero, hll_raw,
        CASE WHEN hll_raw <= ${P.lcThreshold} AND v_zero > 0
          THEN ($lut)[v_zero] ELSE hll_raw END AS hll_est
      FROM est2)"""
  }

  /** The full chain `ev(w_start, key_str)` → `est3` — [[cellsSql]] +
    * [[estChainSql]] composed (the x_hll_window oracle shape). */
  def estimateSql(P: Params = Default): String =
    s"""${cellsSql(P)},
    ${estChainSql(P)}"""
}
