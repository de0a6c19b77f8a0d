package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG encode→decode round-trips within quantization tolerance;
  * the decoder survives arbitrary corruption (same fuzz contract as the
  * wav/bmp/png codecs); metadata parse agrees with the pixel decoder.
  */
class JpegCodecSpec extends AnyFunSuite {

  // smooth gradient — no wrap discontinuities, so quantization error stays
  // near the per-coefficient bound instead of ringing at edges
  private def smooth(w: Int, h: Int)(x: Int, y: Int): (Int, Int, Int) = (
    255 * x / math.max(1, w - 1),
    255 * y / math.max(1, h - 1),
    255 * (x + y) / math.max(1, w + h - 2))

  private def maxErr(img: JpegCodec.JpegImage,
      f: (Int, Int) => (Int, Int, Int)): Int = {
    var m = 0
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val (r, g, b) = f(x, y)
      m = math.max(m, math.abs(img.r(x, y) - r))
      m = math.max(m, math.abs(img.g(x, y) - g))
      m = math.max(m, math.abs(img.b(x, y) - b))
    }
    m
  }

  test("4:4:4 round-trip recovers a smooth gradient within tolerance") {
    // 33x25: neither dimension a multiple of 8 — exercises edge padding
    val (w, h) = (33, 25)
    val bytes = JpegCodec.writeJpegBaseline(w, h, smooth(w, h), quality = 90)
    val img = JpegCodec.decodeJpeg(bytes).get
    assert(img.width == w && img.height == h)
    val e = maxErr(img, smooth(w, h))
    assert(e <= 16, s"max channel error $e")
  }

  test("4:2:0 round-trip recovers a smooth gradient within tolerance") {
    // 35x21: not a multiple of the 16x16 MCU — exercises 2x2 sampling
    // padding and chroma upsampling
    val (w, h) = (35, 21)
    val bytes = JpegCodec.writeJpegBaseline(w, h, smooth(w, h), quality = 90,
      subsample420 = true)
    val img = JpegCodec.decodeJpeg(bytes).get
    assert(img.width == w && img.height == h)
    val e = maxErr(img, smooth(w, h))
    assert(e <= 24, s"max channel error $e (chroma is quarter-res)")
  }

  test("flat-color images round-trip near-exactly at every tiny size") {
    for (w <- Seq(1, 7, 8, 9, 16); h <- Seq(1, 5, 8, 11)) {
      val bytes = JpegCodec.writeJpegBaseline(w, h, (_, _) => (200, 80, 40))
      val img = JpegCodec.decodeJpeg(bytes).get
      assert(img.width == w && img.height == h, s"dims at ${w}x$h")
      val e = maxErr(img, (_, _) => (200, 80, 40))
      assert(e <= 4, s"flat color error $e at ${w}x$h")
    }
  }

  test("restart-marker streams round-trip identically to markerless ones") {
    // 40x24 4:4:4 = 15 MCUs; interval 4 emits RST0..RST2 mid-scan. The
    // decoder must resync (byte-align, reset DC predictors) and produce
    // the SAME pixels as the markerless encoding of the same image.
    val (w, h) = (40, 24)
    val plain = JpegCodec.decodeJpeg(
      JpegCodec.writeJpegBaseline(w, h, smooth(w, h))).get
    val rst = JpegCodec.decodeJpeg(
      JpegCodec.writeJpegBaseline(w, h, smooth(w, h), restartInterval = 4)).get
    assert(rst.pixels.toSeq == plain.pixels.toSeq)
    // and in the subsampled geometry too (6 MCUs, interval 2)
    val plain420 = JpegCodec.decodeJpeg(JpegCodec.writeJpegBaseline(
      w, h, smooth(w, h), subsample420 = true)).get
    val rst420 = JpegCodec.decodeJpeg(JpegCodec.writeJpegBaseline(
      w, h, smooth(w, h), subsample420 = true, restartInterval = 2)).get
    assert(rst420.pixels.toSeq == plain420.pixels.toSeq)
  }

  test("out-of-sequence RSTn indices resync instead of losing the image") {
    // real-world streams drop/duplicate restart markers; the decoder must
    // adopt the stream's counter (libjpeg resync_to_restart posture) and
    // still hand back an image. Rewrite every RSTn in the entropy stream
    // to RST5 — indices are now wrong at every interval but the byte
    // positions are intact, so pixels must be IDENTICAL to the
    // unmodified stream's.
    val (w, h) = (40, 24)
    val bytes = JpegCodec.writeJpegBaseline(w, h, smooth(w, h), restartInterval = 4)
    val expected = JpegCodec.decodeJpeg(bytes).get
    val mangled = bytes.clone()
    // scan entropy data only (after SOS): stuffed FFs are followed by 0x00,
    // so any 0xFF D0-D7 pair is a restart marker
    for (i <- mangled.indices.dropRight(1))
      if ((mangled(i) & 0xff) == 0xff &&
          (mangled(i + 1) & 0xff) >= 0xd0 && (mangled(i + 1) & 0xff) <= 0xd7)
        mangled(i + 1) = 0xd5.toByte
    assert(mangled.toSeq != bytes.toSeq, "fixture must actually mangle markers")
    val got = JpegCodec.decodeJpeg(mangled)
    assert(got.isDefined, "wrong RSTn index must resync, not abort")
    assert(got.get.pixels.toSeq == expected.pixels.toSeq)
  }

  test("fuzz: corrupted restart stream never throws") {
    val bytes = JpegCodec.writeJpegBaseline(40, 24, smooth(40, 24),
      restartInterval = 3)
    for (off <- bytes.indices by 7) {
      val c = bytes.clone()
      c(off) = (c(off) ^ 0xff).toByte
      JpegCodec.decodeJpeg(c)
    }
  }

  test("parseJpegMeta agrees with the pixel decoder on encoder output") {
    val bytes = JpegCodec.writeJpegBaseline(40, 30, smooth(40, 30))
    val meta = MediaCodecs.parseJpegMeta(bytes).get
    assert(meta.width == 40 && meta.height == 30 && meta.nComponents == 3)
    val bytes420 = JpegCodec.writeJpegBaseline(40, 30, smooth(40, 30),
      subsample420 = true)
    val meta420 = MediaCodecs.parseJpegMeta(bytes420).get
    assert(meta420.width == 40 && meta420.height == 30)
  }

  test("decode is deterministic") {
    val bytes = JpegCodec.writeJpegBaseline(24, 16, smooth(24, 16))
    val a = JpegCodec.decodeJpeg(bytes).get
    val b = JpegCodec.decodeJpeg(bytes).get
    assert(a.pixels.toSeq == b.pixels.toSeq)
  }

  test("the header-only writer shell (no scan) decodes to None, not a throw") {
    assert(JpegCodec.decodeJpeg(MediaCodecs.writeJpegShell(100, 60)).isEmpty)
  }

  test("fuzz: every truncation of a valid stream returns without throwing") {
    val bytes = JpegCodec.writeJpegBaseline(17, 13, smooth(17, 13))
    for (n <- 0 until bytes.length) {
      JpegCodec.decodeJpeg(bytes.take(n)) // must not throw; None or partial
    }
  }

  test("fuzz: single-byte corruption at every offset never throws") {
    val bytes = JpegCodec.writeJpegBaseline(17, 13, smooth(17, 13))
    for (off <- bytes.indices) {
      val c = bytes.clone()
      c(off) = (c(off) ^ 0x55).toByte
      JpegCodec.decodeJpeg(c) // corrupt pixels allowed; exceptions are not
    }
  }

  test("fuzz: deterministic garbage never throws and never decodes") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val g = Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      assert(JpegCodec.decodeJpeg(g).isEmpty || g.length > 2)
    }
  }

  test("grayscale: non-interleaved scan; declared sampling factors ignored") {
    // T.81 A.2: a one-component scan is one 8x8 unit per MCU regardless
    // of SOF sampling — 0x22-declared must decode identically to 0x11
    def ramp(x: Int, y: Int): Int = math.min(255, x * 6 + y * 4)
    val plain = JpegCodec.decodeJpeg(
      JpegCodec.writeJpegGray(29, 18, ramp)).get
    assert(plain.width == 29 && plain.height == 18)
    // grayscale decode replicates into RGB; tolerance as the color paths
    var e = 0
    for (y <- 0 until 18; x <- 0 until 29)
      e = math.max(e, math.abs(plain.r(x, y) - ramp(x, y)))
    assert(e <= 16, s"gray round-trip error $e")
    val declared22 = JpegCodec.decodeJpeg(
      JpegCodec.writeJpegGray(29, 18, ramp, declaredSampling = 0x22)).get
    assert(declared22.pixels.toSeq == plain.pixels.toSeq,
      "declared 2x2 sampling must be ignored for a one-component scan")
  }

  test("fuzz: sampling-factor plane blowup is rejected, not allocated") {
    // modest MCU count x 4x4 sampling = multi-GiB claimed planes; the
    // bound must reject on total plane samples without OOM (the old
    // MCU-count bound passed this stream)
    val big = JpegCodec.writeJpegBaseline(8, 8, smooth(8, 8))
    val idx = big.indices.dropRight(1)
      .find(i => (big(i) & 0xff) == 0xff && (big(i + 1) & 0xff) == 0xc0).get
    val c = big.clone()
    c(idx + 5) = 0x3f.toByte; c(idx + 6) = 0xc0.toByte // height 16320
    c(idx + 7) = 0xff.toByte; c(idx + 8) = 0xff.toByte // width 65535
    c(idx + 11) = 0x44.toByte // component 1: 4x4 sampling
    assert(JpegCodec.decodeJpeg(c).isEmpty)
  }

  test("fuzz: absurd claimed dimensions are rejected before allocation") {
    // a stream whose SOF claims 65535x65535 must fail fast, not OOM
    val big = JpegCodec.writeJpegBaseline(8, 8, smooth(8, 8))
    // SOF0 body starts after marker+len: find FFC0 and patch dims
    val idx = big.indices.dropRight(1)
      .find(i => (big(i) & 0xff) == 0xff && (big(i + 1) & 0xff) == 0xc0).get
    val c = big.clone()
    c(idx + 5) = 0xff.toByte; c(idx + 6) = 0xff.toByte // height
    c(idx + 7) = 0xff.toByte; c(idx + 8) = 0xff.toByte // width
    assert(JpegCodec.decodeJpeg(c).isEmpty)
  }
}
