package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** GIF round-trips are EXACT (palette format, lossless LZW) — unlike the
  * JPEG bounded-error contract, every pixel index and palette entry must
  * survive encode→decode bit-identically, including interlaced storage,
  * animations, and streams long enough to overflow the 4096-entry LZW
  * table. The decoder carries the shared media fuzz contract: never
  * throws on arbitrary bytes, rejects absurd dimensions before
  * allocation.
  */
class GifCodecSpec extends AnyFunSuite {

  /** Deterministic noise indices — poor LZW compressibility, so code
    * widths grow and (for large frames) the dictionary hard-resets. */
  private def noise(w: Int, h: Int, nColors: Int, seed: Int): Array[Byte] = {
    val a = new Array[Byte](w * h)
    var i = 0
    while (i < a.length) {
      a(i) = (((i * 7919 + seed * 104729) >>> 3) % nColors).toByte
      i += 1
    }
    a
  }

  private def palette(n: Int): Array[Int] =
    Array.tabulate(n)(i => (i * 2654435761L & 0xffffff).toInt)

  test("single-frame round-trip is pixel- and palette-exact") {
    for ((w, h, nc) <- Seq((1, 1, 2), (7, 5, 3), (40, 30, 16), (33, 21, 256))) {
      val pal = palette(nc)
      val idx = noise(w, h, nc, seed = nc)
      val img = GifCodec.decodeGif(GifCodec.writeGif(w, h, pal, idx)).get
      assert(img.width == w && img.height == h, s"dims at ${w}x$h/$nc")
      assert(img.indices.toSeq == idx.toSeq, s"indices at ${w}x$h/$nc")
      assert(img.palette.take(nc).toSeq == pal.toSeq, s"palette at $nc")
    }
  }

  test("LZW table overflow (noise past 4096 codes) round-trips exactly") {
    // 300x200 noise over 256 colors assigns far more than 4096 codes →
    // exercises the encoder's CLEAR-and-reset and the decoder's mirror
    val (w, h) = (300, 200)
    val idx = noise(w, h, 256, seed = 1)
    val img = GifCodec.decodeGif(GifCodec.writeGif(w, h, palette(256), idx)).get
    assert(img.indices.toSeq == idx.toSeq)
  }

  test("interlaced storage round-trips to the same row order as linear") {
    val (w, h) = (23, 19) // odd dims: all four interlace passes non-empty
    val idx = noise(w, h, 7, seed = 3)
    val linear = GifCodec.decodeGif(
      GifCodec.writeGif(w, h, palette(7), idx)).get
    val inter = GifCodec.decodeGif(
      GifCodec.writeGif(w, h, palette(7), idx, interlaced = true)).get
    assert(inter.indices.toSeq == linear.indices.toSeq)
    assert(inter.indices.toSeq == idx.toSeq)
  }

  test("animated GIF: all frames decode exactly; meta reports animation") {
    val (w, h, nc) = (17, 11, 5)
    val frames = (0 until 4).map(f => noise(w, h, nc, seed = f))
    val bytes = GifCodec.writeGifAnimated(w, h, palette(nc), frames, delayCs = 10)
    val decoded = GifCodec.decodeGifFrames(bytes).get
    assert(decoded.size == 4)
    decoded.zip(frames).foreach { case (img, src) =>
      assert(img.width == w && img.height == h)
      assert(img.indices.toSeq == src.toSeq)
    }
    val meta = GifCodec.parseGifMeta(bytes).get
    assert(meta.width == w && meta.height == h)
    assert(meta.nFrames == 4 && meta.animated)
    // decodeGif (first frame only) agrees with frame 0
    assert(GifCodec.decodeGif(bytes).get.indices.toSeq == frames.head.toSeq)
  }

  test("meta parse agrees with the pixel decoder on single frames") {
    val bytes = GifCodec.writeGif(31, 22, palette(16), noise(31, 22, 16, 0))
    val meta = GifCodec.parseGifMeta(bytes).get
    assert(meta.width == 31 && meta.height == 22)
    assert(meta.gctSize == 16 && meta.nFrames == 1 && !meta.animated)
  }

  test("GIF87a magic is accepted") {
    val bytes = GifCodec.writeGif(9, 6, palette(4), noise(9, 6, 4, 2))
    bytes(4) = '7'.toByte // GIF89a → GIF87a
    assert(GifCodec.decodeGif(bytes).get.indices.toSeq ==
      noise(9, 6, 4, 2).toSeq)
    assert(GifCodec.parseGifMeta(bytes).get.nFrames == 1)
  }

  test("a local color table overrides the global one") {
    // Surgery on the writer's deterministic layout: move the GCT into the
    // image descriptor as an LCT with permuted colors. Layout: 6 magic +
    // 7 LSD = 13 header bytes, then 3*2^bits GCT, then the 10-byte image
    // descriptor, then LZW data.
    val nc = 4
    val idx = noise(8, 8, nc, 5)
    val bytes = GifCodec.writeGif(8, 8, palette(nc), idx)
    val gctLen = 3 * 4 // nc=4 pads to 2^2
    val gct = bytes.slice(13, 13 + gctLen)
    val lct = gct.grouped(3).toArray.reverse.flatten // permuted palette
    val desc = bytes.slice(13 + gctLen, 13 + gctLen + 10)
    assert(desc(0) == 0x2c)
    desc(9) = (0x80 | 1).toByte // LCT present, size 2^2
    val rest = bytes.drop(13 + gctLen + 10)
    val header = bytes.slice(0, 13)
    header(10) = (header(10) & 0x7f).toByte // drop the GCT flag
    val spliced = header ++ desc ++ lct ++ rest
    val img = GifCodec.decodeGif(spliced).get
    assert(img.indices.toSeq == idx.toSeq)
    val orig = palette(nc)
    assert(img.palette.take(nc).toSeq == orig.indices.map(i => orig(nc - 1 - i)))
  }

  test("fuzz: every truncation of a valid stream returns without throwing") {
    val bytes = GifCodec.writeGifAnimated(
      14, 9, palette(8), (0 until 2).map(f => noise(14, 9, 8, f)), 5)
    for (n <- 0 until bytes.length) {
      val cut = bytes.slice(0, n)
      GifCodec.decodeGif(cut)
      GifCodec.decodeGifFrames(cut)
      GifCodec.parseGifMeta(cut)
    }
  }

  test("fuzz: single-byte corruption at every offset never throws") {
    val bytes = GifCodec.writeGif(12, 10, palette(6), noise(12, 10, 6, 4),
      interlaced = true)
    for (i <- bytes.indices; delta <- Seq(1, 0x55, 0xff)) {
      val c = bytes.clone()
      c(i) = (c(i) ^ delta).toByte
      GifCodec.decodeGif(c)
      GifCodec.parseGifMeta(c)
    }
  }

  test("fuzz: deterministic garbage never throws and never decodes") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val junk = Array.fill[Byte](rnd.nextInt(400))(rnd.nextInt().toByte)
      assert(GifCodec.decodeGif(junk).isEmpty ||
        !junk.startsWith("GIF".getBytes)) // real decode needs real magic
      GifCodec.parseGifMeta(junk)
    }
    // garbage wearing a valid magic still must not throw
    for (seed <- 0 until 100) {
      val r2 = new scala.util.Random(seed)
      val junk = "GIF89a".getBytes("US-ASCII") ++
        Array.fill[Byte](60)(r2.nextInt().toByte)
      GifCodec.decodeGif(junk)
      GifCodec.parseGifMeta(junk)
    }
  }

  test("fuzz: absurd claimed dimensions are rejected before allocation") {
    // 65535x65535 frame dims = 4.3G pixels — must fail fast, not OOM.
    val bytes = GifCodec.writeGif(4, 4, palette(2), noise(4, 4, 2, 0))
    val gctLen = 3 * 2
    val descAt = 13 + gctLen
    val c = bytes.clone()
    c(descAt + 5) = 0xff.toByte; c(descAt + 6) = 0xff.toByte // frame w
    c(descAt + 7) = 0xff.toByte; c(descAt + 8) = 0xff.toByte // frame h
    assert(GifCodec.decodeGif(c).isEmpty)
  }

  test("corrupt LZW aborts the frame (no partial pixels), later frames truncate") {
    val frames = (0 until 3).map(f => noise(10, 10, 4, f))
    val bytes = GifCodec.writeGifAnimated(10, 10, palette(4), frames, 5)
    // zero out the tail third of the byte stream: frame 0 survives,
    // the damaged later frame truncates the sequence, never throws
    val c = bytes.clone()
    for (i <- (c.length * 2 / 3) until c.length - 1) c(i) = 0
    val out = GifCodec.decodeGifFrames(c)
    out.foreach { fs =>
      fs.zip(frames).foreach { case (img, src) =>
        assert(img.indices.toSeq == src.toSeq) // any kept frame is EXACT
      }
    }
  }
}
