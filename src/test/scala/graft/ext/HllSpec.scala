package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Hll.Params derivations — the constants BOTH engines inline,
  * so a drift here is a cross-engine hash mismatch waiting to happen:
  *  - continuity with the legacy m = 64 gate constants (alphaE6 709341,
  *    numerator 2905460736000000, rhoBase 55 — the values x_hll_window
  *    shipped hard-coded before the shared module);
  *  - the m = 1024 default's derived values;
  *  - Long-safety bounds (m = 2048 admitted, 4096 rejected — its
  *    α·m²·1e12 ≈ 1.2e19 > 2^63);
  *  - LUT endpoints: lut(0) = round(m·ln m) (V = 1) and lut(m−1) = 0
  *    (V = m: every register hit, ln 1 = 0).
  */
class HllSpec extends AnyFunSuite {

  test("m = 64 params reproduce the legacy hard-coded gate constants") {
    val p = Hll.Params(64)
    assert(Hll.alphaE6(64) == 709341L)
    assert(p.numerator == 2905460736000000L)
    assert(p.rhoBase == 55)
    assert(p.lcThreshold == 160L)
  }

  test("m = 1024 default: derived values and bound") {
    val p = Hll.Default
    assert(p.m == 1024)
    assert(p.rhoBase == 51)
    assert(p.numerator == Hll.alphaE6(1024) * 1024L * 1024L * 1000000L)
    assert(p.numerator > 0, "numerator overflowed Long")
    // 5 * 1.04/sqrt(1024) = 0.1625 -> 162500 ppm
    assert(p.boundPpm == 162500L)
    assert(p.lut.length == 1024)
    assert(p.lut(0) == math.round(1024 * math.log(1024.0)))
    assert(p.lut(1023) == 0L)
  }

  test("m bounds: 2048 is the last Long-safe size, 16384 admitted via " +
      "the wide-integer path, 32768 and non-powers rejected") {
    assert(Hll.Params(2048).numeratorLongSafe)
    assert(Hll.Params(2048).numerator > 0)
    val p4k = Hll.Params(4096)
    assert(!p4k.numeratorLongSafe)
    intercept[IllegalArgumentException] { p4k.numerator } // fail-loudly
    intercept[IllegalArgumentException] { Hll.Params(32768) }
    intercept[IllegalArgumentException] { Hll.Params(1000) }
    intercept[IllegalArgumentException] { Hll.Params(8) }
  }

  test("small-m alpha honors the paper's discrete constants; the " +
      "formula holds from m = 64 up") {
    assert(Hll.alphaE6(16) == 673000L) // α16 = 0.673 (Flajolet et al.)
    assert(Hll.alphaE6(32) == 697000L) // α32 = 0.697
    assert(Hll.alphaE6(64) == 709341L) // legacy formula value, pinned
  }

  test("m = 16384: wide-integer numerator exact, derived values") {
    val p = Hll.Params(16384)
    assert(p.p == 14 && p.rhoBase == 47)
    assert(p.numeratorBig ==
      BigInt(Hll.alphaE6(16384)) * 16384 * 16384 * 1000000L)
    assert(p.numeratorBig > BigInt(Long.MaxValue), "should exceed Long")
    // 5 * 1.04/sqrt(16384) = 0.040625 -> 40625 ppm
    assert(p.boundPpm == 40625L)
    assert(p.lut.length == 16384)
    assert(p.lut(0) == math.round(16384 * math.log(16384.0)))
    assert(p.lut(16383) == 0L)
  }
}
