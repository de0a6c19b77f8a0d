package graft.ext

/** Pure-JVM baseline JPEG codec — the last media stub retired. The
  * container has no codec libraries, so both directions are implemented
  * from the public spec (ITU-T T.81): a baseline sequential ENCODER
  * (writer-shell fixture generator, 4:4:4 or 4:2:0) and a general
  * baseline DECODER (DQT / DHT / SOF0 / SOS / DRI marker parse, canonical
  * Huffman entropy decode with byte unstuffing and restart markers,
  * dequantize, separable double-precision IDCT, chroma upsampling for
  * arbitrary 1..4 sampling factors, YCbCr → RGB). Quant and Huffman
  * tables are the public Annex K defaults.
  *
  * Scope: baseline sequential DCT, 8-bit precision, 1 or 3 components,
  * one scan (SOF0; SOF2 progressive and arithmetic coding are out of
  * scope and return None). That covers the overwhelming majority of
  * real-world JFIF files and everything this encoder emits.
  *
  * Robustness contract (fuzz-spec-pinned like the wav/bmp/png decoders):
  * [[decodeJpeg]] NEVER throws on arbitrary bytes — wrong magic,
  * truncation at any offset, or bit corruption yields None (or a decoded
  * image when the corruption lands harmlessly in pixel data).
  *
  * Scale shape: like the other MediaCodecs entry points this is per-row
  * driver-free work inside a narrow mapPartitions chain — bytes never
  * shuffle; only extracted features leave the partition.
  */
object JpegCodec {

  final case class JpegImage(width: Int, height: Int, pixels: Array[Int]) {
    def r(x: Int, y: Int): Int = (pixels(y * width + x) >> 16) & 0xff
    def g(x: Int, y: Int): Int = (pixels(y * width + x) >> 8) & 0xff
    def b(x: Int, y: Int): Int = pixels(y * width + x) & 0xff
  }

  // ---- shared tables (ITU-T T.81 Annex K) ----------------------------------

  /** zigzag position -> natural (row-major) index */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance quant table, natural order. */
  private val StdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K chrominance quant table, natural order. */
  private val StdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K default Huffman specs: (bits per code length 1..16, symbols)
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** libjpeg-compatible quality scaling of a base quant table. */
  private def scaleQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  /** cosTab(u)(x) = cos((2x+1) u pi / 16) scaled by the DCT normalization
    * a(u) = 1/sqrt(2) for u = 0 else 1, and the global 1/2. */
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val a = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * a * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---- canonical Huffman ---------------------------------------------------

  /** Decode tables per T.81 F.2.2.3: minCode/maxCode/valPtr per length. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def symbol(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** Encode table: symbol -> (code, length), canonical assignment. */
  private def huffEncoder(bits: Array[Int], vals: Array[Int]): Array[Int] = {
    // packed as (len << 16) | code, indexed by symbol
    val table = new Array[Int](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        table(vals(k)) = (l << 16) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    table
  }

  // ---- DCT -----------------------------------------------------------------

  /** Forward DCT of a level-shifted 8x8 block (row-major), natural order. */
  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) * CosTab(u)(x) * CosTab(v)(y)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse DCT; output still level-shifted (add 128 and clamp after). */
  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            s += coef(v * 8 + u) * CosTab(u)(x) * CosTab(v)(y)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    out
  }

  private def clamp8(v: Double): Int = {
    val i = math.round(v).toInt
    if (i < 0) 0 else if (i > 255) 255 else i
  }

  // ---- encoder -------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >>> (nBits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s per spec
      val pad = 8 - nBits
      put((1 << pad) - 1, pad)
    }
  }

  /** Magnitude category (size) of a DC diff or AC value. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Value bits: negative values are encoded as v - 1 in `size` bits. */
  private def valueBits(v: Int, size: Int): Int =
    if (v >= 0) v else v - 1 + (1 << size) // two's-comp low bits of v-1

  /** Encode a baseline JFIF image. `rgb(x, y)` supplies pixels; `quality`
    * follows the libjpeg 1..100 convention; `subsample420` selects 2x2
    * luma sampling with quarter-resolution chroma (averaged), else 4:4:4.
    * Annex K default Huffman tables, one interleaved scan.
    * `restartInterval` > 0 emits a DRI marker and RSTn every that many
    * MCUs (bit buffer flushed, DC predictors reset) — the resync
    * mechanism real encoders use, here mainly so the decoder's restart
    * path is exercised by round-trip fixtures.
    */
  def writeJpegBaseline(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int),
      quality: Int = 90, subsample420: Boolean = false,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff)
    val lumaQ = scaleQ(StdLumaQ, quality)
    val chromaQ = scaleQ(StdChromaQ, quality)

    // full-resolution planes, doubles, already level-shifted by -128
    val yP = new Array[Double](w * h)
    val cbF = new Array[Double](w * h)
    val crF = new Array[Double](w * h)
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val (r, g, b) = rgb(xx, yy)
        val i = yy * w + xx
        yP(i) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cbF(i) = -0.168736 * r - 0.331264 * g + 0.5 * b
        crF(i) = 0.5 * r - 0.418688 * g - 0.081312 * b
        xx += 1
      }
      yy += 1
    }

    val (hY, vY) = if (subsample420) (2, 2) else (1, 1)
    val mcuW = 8 * hY
    val mcuH = 8 * vY
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH

    // chroma planes at their sampled resolution (edge-replicated average)
    val cw = if (subsample420) (w + 1) / 2 else w
    val ch = if (subsample420) (h + 1) / 2 else h
    def sampleChroma(src: Array[Double]): Array[Double] =
      if (!subsample420) src
      else Array.tabulate(cw * ch) { i =>
        val cx = i % cw; val cy = i / cw
        var s = 0.0; var n = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val sx = cx * 2 + dx; val sy = cy * 2 + dy
            if (sx < w && sy < h) { s += src(sy * w + sx); n += 1 }
            dx += 1
          }
          dy += 1
        }
        s / n
      }
    val cbP = sampleChroma(cbF)
    val crP = sampleChroma(crF)

    // per-plane 8x8 block fetch with edge replication
    def block(plane: Array[Double], pw: Int, ph: Int, bx: Int, by: Int): Array[Double] =
      Array.tabulate(64) { i =>
        val x = math.min(bx * 8 + i % 8, pw - 1)
        val y = math.min(by * 8 + i / 8, ph - 1)
        plane(y * pw + x)
      }

    def quantize(coef: Array[Double], q: Array[Int]): Array[Int] =
      Array.tabulate(64)(i => math.round(coef(i) / q(i)).toInt)

    val dcL = huffEncoder(DcLumaBits, DcLumaVals)
    val acL = huffEncoder(AcLumaBits, AcLumaVals)
    val dcC = huffEncoder(DcChromaBits, DcChromaVals)
    val acC = huffEncoder(AcChromaBits, AcChromaVals)

    val entropy = new java.io.ByteArrayOutputStream()
    val bw = new BitWriter(entropy)
    val dcPred = new Array[Int](3)

    def encodeBlock(coefN: Array[Int], comp: Int): Unit = {
      val (dcT, acT) = if (comp == 0) (dcL, acL) else (dcC, acC)
      // zigzag reorder
      val z = Array.tabulate(64)(k => coefN(Zigzag(k)))
      val diff = z(0) - dcPred(comp)
      dcPred(comp) = z(0)
      val s = category(diff)
      val dcCode = dcT(s)
      bw.put(dcCode & 0xffff, dcCode >>> 16)
      if (s > 0) bw.put(valueBits(diff, s), s)
      var k = 1
      var run = 0
      while (k < 64) {
        if (z(k) == 0) run += 1
        else {
          while (run >= 16) {
            val zrl = acT(0xf0); bw.put(zrl & 0xffff, zrl >>> 16); run -= 16
          }
          val sz = category(z(k))
          val sym = (run << 4) | sz
          val c = acT(sym)
          bw.put(c & 0xffff, c >>> 16)
          bw.put(valueBits(z(k), sz), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val eob = acT(0x00); bw.put(eob & 0xffff, eob >>> 16) }
    }

    var my = 0
    var mcuIdx = 0
    var rstN = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          bw.flush() // byte-align (1-padded) before the marker
          entropy.write(0xff); entropy.write(0xd0 + (rstN & 7))
          rstN += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        var by = 0
        while (by < vY) {
          var bx = 0
          while (bx < hY) {
            encodeBlock(quantize(
              fdct(block(yP, w, h, mx * hY + bx, my * vY + by)), lumaQ), 0)
            bx += 1
          }
          by += 1
        }
        encodeBlock(quantize(fdct(block(cbP, cw, ch, mx, my)), chromaQ), 1)
        encodeBlock(quantize(fdct(block(crP, cw, ch, mx, my)), chromaQ), 2)
        mcuIdx += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()

    // ---- container ----
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int, body: Array[Int]): Unit = {
      u8(0xff); u8(m); u16(body.length + 2); body.foreach(u8)
    }
    u8(0xff); u8(0xd8) // SOI
    marker(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    marker(0xdb, 0 +: Array.tabulate(64)(k => lumaQ(Zigzag(k))))
    marker(0xdb, 1 +: Array.tabulate(64)(k => chromaQ(Zigzag(k))))
    marker(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, 3,
      1, (hY << 4) | vY, 0, 2, 0x11, 1, 3, 0x11, 1))
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit =
      marker(0xc4, ((cls << 4) | id) +: (bits.drop(1) ++ vals))
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, AcLumaBits, AcLumaVals)
    dht(0, 1, DcChromaBits, DcChromaVals)
    dht(1, 1, AcChromaBits, AcChromaVals)
    if (restartInterval > 0)
      marker(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    marker(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    entropy.toByteArray.foreach(b => out.write(b & 0xff))
    u8(0xff); u8(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a single-component (grayscale) baseline JFIF. Per T.81 A.2 a
    * one-component scan is NON-interleaved — one 8x8 data unit per MCU,
    * ceil(w/8) × ceil(h/8) units in row order, REGARDLESS of the sampling
    * factors the SOF declares. `declaredSampling` (packed h<<4|v) lets
    * fixtures pin that rule: a conforming decoder must ignore it for a
    * one-component scan, so 0x22 here must decode identically to 0x11.
    */
  def writeJpegGray(w: Int, h: Int, gray: (Int, Int) => Int,
      quality: Int = 90, declaredSampling: Int = 0x11): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff)
    val lumaQ = scaleQ(StdLumaQ, quality)
    val dcL = huffEncoder(DcLumaBits, DcLumaVals)
    val acL = huffEncoder(AcLumaBits, AcLumaVals)
    val entropy = new java.io.ByteArrayOutputStream()
    val bw = new BitWriter(entropy)
    var dcPred = 0
    val bxN = (w + 7) / 8
    val byN = (h + 7) / 8
    var by = 0
    while (by < byN) {
      var bx = 0
      while (bx < bxN) {
        val block = Array.tabulate(64) { i =>
          val x = math.min(bx * 8 + i % 8, w - 1)
          val y = math.min(by * 8 + i / 8, h - 1)
          gray(x, y).toDouble - 128.0
        }
        val coefN = fdct(block).zipWithIndex
          .map { case (v, i) => math.round(v / lumaQ(i)).toInt }
        val z = Array.tabulate(64)(k => coefN(Zigzag(k)))
        val diff = z(0) - dcPred
        dcPred = z(0)
        val s = category(diff)
        val dcCode = dcL(s)
        bw.put(dcCode & 0xffff, dcCode >>> 16)
        if (s > 0) bw.put(valueBits(diff, s), s)
        var k = 1
        var run = 0
        while (k < 64) {
          if (z(k) == 0) run += 1
          else {
            while (run >= 16) {
              val zrl = acL(0xf0); bw.put(zrl & 0xffff, zrl >>> 16); run -= 16
            }
            val sz = category(z(k))
            val code = acL((run << 4) | sz)
            bw.put(code & 0xffff, code >>> 16)
            bw.put(valueBits(z(k), sz), sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val eob = acL(0x00); bw.put(eob & 0xffff, eob >>> 16) }
        bx += 1
      }
      by += 1
    }
    bw.flush()

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int, body: Array[Int]): Unit = {
      u8(0xff); u8(m); u16(body.length + 2); body.foreach(u8)
    }
    u8(0xff); u8(0xd8)
    marker(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    marker(0xdb, 0 +: Array.tabulate(64)(k => lumaQ(Zigzag(k))))
    marker(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      1, 1, declaredSampling, 0))
    marker(0xc4, (0x00 +: (DcLumaBits.drop(1) ++ DcLumaVals)))
    marker(0xc4, (0x10 +: (AcLumaBits.drop(1) ++ AcLumaVals)))
    marker(0xda, Array(1, 1, 0x00, 0, 63, 0))
    entropy.toByteArray.foreach(b => out.write(b & 0xff))
    u8(0xff); u8(0xd9)
    out.toByteArray
  }

  // ---- decoder -------------------------------------------------------------

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    /** next bit, or -1 when the stream ends — either true truncation or
      * a non-RST marker (pos is rewound to the marker's 0xFF so restart()
      * can inspect it); decode paths treat both as termination via the
      * -1 sentinel */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) return -1
          val nxt = b(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed FF
          else { pos -= 1; return -1 } // marker: rewind to its 0xFF
          v = 0xff
        }
        acc = v; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit(); if (x < 0) return Int.MinValue
        v = (v << 1) | x
        i += 1
      }
      v
    }
    /** Byte-align and consume the next RST marker; returns its index
      * (0–7), or -1 on anything that is not an RSTn. ANY RSTn is
      * accepted — a dropped or duplicated restart marker in a
      * real-world stream resynchronizes (the caller adopts the
      * stream's counter, libjpeg's resync_to_restart posture) instead
      * of aborting the whole decode; pixels of the affected interval
      * may shift, the rest of the image survives. */
    def restart(): Int = {
      nBits = 0
      // tolerate fill bytes before the marker
      while (pos + 1 < b.length && (b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) == 0xff)
        pos += 1
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return -1
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return -1
      pos += 2
      m - 0xd0
    }
    def decodeHuff(t: HuffDecoder): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val x = bit(); if (x < 0) return -1
        code = (code << 1) | x
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) return t.symbol(l, code)
        l += 1
      }
      -1
    }
  }

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private final case class Component(
      id: Int, hSamp: Int, vSamp: Int, qId: Int,
      var dcId: Int = 0, var acId: Int = 0)

  /** Decode a baseline sequential JPEG to RGB pixels. None on anything
    * that is not a well-formed single-scan baseline stream (progressive,
    * arithmetic, 12-bit, >3 components, malformed markers, truncation).
    */
  def decodeJpeg(bytes: Array[Byte]): Option[JpegImage] =
    try decodeImpl(bytes)
    catch { case _: Exception => None } // fuzz hard-stop: never throw

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def decodeImpl(b: Array[Byte]): Option[JpegImage] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val qTabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xff) { i += 1 }
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else if (m == 0xd9) return None // EOI before SOS
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val body = i + 4
        val bodyLen = len - 2
        m match {
          case 0xdb => // DQT: one or more (PqTq, 64/128 bytes) entries
            var p = body
            while (p < body + bodyLen) {
              val pq = (b(p) & 0xf0) >> 4
              val tq = b(p) & 0x0f
              if (tq > 3) return None
              val t = new Array[Int](64)
              if (pq == 0) {
                if (p + 65 > body + bodyLen) return None
                var k = 0
                while (k < 64) { t(Zigzag(k)) = b(p + 1 + k) & 0xff; k += 1 }
                p += 65
              } else {
                if (p + 129 > body + bodyLen) return None
                var k = 0
                while (k < 64) { t(Zigzag(k)) = be16(b, p + 1 + 2 * k); k += 1 }
                p += 129
              }
              qTabs(tq) = t
            }
          case 0xc4 => // DHT: one or more tables
            var p = body
            while (p < body + bodyLen) {
              if (p + 17 > body + bodyLen) return None
              val cls = (b(p) & 0xf0) >> 4
              val id = b(p) & 0x0f
              if (cls > 1 || id > 3) return None
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = b(p + l) & 0xff; total += bits(l); l += 1 }
              if (p + 17 + total > body + bodyLen || total > 256) return None
              val vals = Array.tabulate(total)(k => b(p + 17 + k) & 0xff)
              val dec = new HuffDecoder(bits, vals)
              if (cls == 0) dcTabs(id) = dec else acTabs(id) = dec
              p += 17 + total
            }
          case 0xc0 | 0xc1 => // baseline (extended sequential shares layout)
            if (bodyLen < 6) return None
            if ((b(body) & 0xff) != 8) return None // precision
            height = be16(b, body + 1)
            width = be16(b, body + 3)
            val n = b(body + 5) & 0xff
            if (width == 0 || height == 0 || (n != 1 && n != 3)) return None
            if (bodyLen < 6 + 3 * n) return None
            comps = Array.tabulate(n) { c =>
              val o = body + 6 + 3 * c
              val hs = (b(o + 1) & 0xf0) >> 4
              val vs = b(o + 1) & 0x0f
              if (hs < 1 || hs > 4 || vs < 1 || vs > 4) return None
              Component(b(o) & 0xff, hs, vs, b(o + 2) & 0x0f)
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return None // progressive / arithmetic / hierarchical
          case 0xdd =>
            if (bodyLen < 2) return None
            restartInterval = be16(b, body)
          case 0xda =>
            if (comps == null) return None
            val ns = b(body) & 0xff
            if (ns != comps.length || bodyLen < 1 + 2 * ns + 3) return None
            var c = 0
            while (c < ns) {
              val sel = b(body + 1 + 2 * c) & 0xff
              val comp = comps.find(_.id == sel).getOrElse(return None)
              comp.dcId = (b(body + 2 + 2 * c) & 0xf0) >> 4
              comp.acId = b(body + 2 + 2 * c) & 0x0f
              c += 1
            }
            return decodeScan(b, i + 2 + len, comps, qTabs, dcTabs, acTabs,
              width, height, restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        i += 2 + len
      }
    }
    None
  }

  private def decodeScan(b: Array[Byte], scanStart: Int,
      compsIn: Array[Component], qTabs: Array[Array[Int]],
      dcTabs: Array[HuffDecoder], acTabs: Array[HuffDecoder],
      width: Int, height: Int, restartInterval: Int): Option[JpegImage] = {
    // T.81 A.2: a SINGLE-component scan is NON-interleaved — one 8x8
    // data unit per MCU, ceil(w/8) x ceil(h/8) units, sampling factors
    // ignored (a valid grayscale file may still DECLARE 2x2 sampling)
    val comps =
      if (compsIn.length == 1) compsIn.map(_.copy(hSamp = 1, vSamp = 1))
      else compsIn
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val nC = comps.length
    // allocation sanity bound: cap TOTAL plane samples (the quantity that
    // actually allocates), not MCU count — a crafted SOF can pair a
    // modest MCU count with 4x4 sampling and claim multi-GiB planes
    // (fuzz contract: reject, never OOM). 2^26 ints = 256 MB ceiling.
    val totalSamples = comps.map(c =>
      mcusX.toLong * c.hSamp * 8 * mcusY * c.vSamp * 8).sum
    if (totalSamples > (1L << 26)) return None
    val planes = new Array[Array[Int]](nC)
    val planeW = new Array[Int](nC)
    val planeH = new Array[Int](nC)
    var c = 0
    while (c < nC) {
      planeW(c) = mcusX * comps(c).hSamp * 8
      planeH(c) = mcusY * comps(c).vSamp * 8
      planes(c) = new Array[Int](planeW(c) * planeH(c))
      if (qTabs(comps(c).qId) == null) return None
      if (dcTabs(comps(c).dcId) == null || acTabs(comps(c).acId) == null)
        return None
      c += 1
    }

    val br = new BitReader(b, scanStart)
    val dcPred = new Array[Int](nC)
    val coefZ = new Array[Int](64)
    val coefD = new Array[Double](64)

    var mcusSinceRst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRst == restartInterval) {
          // any RSTn resyncs (a non-RST marker here still aborts: the
          // scan genuinely ended early) — a dropped/duplicated marker
          // costs one interval's alignment, not the image
          if (br.restart() < 0) return None
          mcusSinceRst = 0
          java.util.Arrays.fill(dcPred, 0)
        }
        c = 0
        while (c < nC) {
          val comp = comps(c)
          val q = qTabs(comp.qId)
          var by = 0
          while (by < comp.vSamp) {
            var bx = 0
            while (bx < comp.hSamp) {
              // ---- one block ----
              java.util.Arrays.fill(coefZ, 0)
              val s = br.decodeHuff(dcTabs(comp.dcId))
              if (s < 0 || s > 15) return None
              val diffBits = if (s == 0) 0 else br.receive(s)
              if (diffBits == Int.MinValue) return None
              dcPred(c) += extend(diffBits, s)
              coefZ(0) = dcPred(c)
              var k = 1
              var done = false
              while (k < 64 && !done) {
                val rs = br.decodeHuff(acTabs(comp.acId))
                if (rs < 0) return None
                val run = rs >> 4
                val size = rs & 0x0f
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else done = true // EOB
                } else {
                  k += run
                  if (k > 63) return None
                  val vb = br.receive(size)
                  if (vb == Int.MinValue) return None
                  coefZ(k) = extend(vb, size)
                  k += 1
                }
              }
              var z = 0
              while (z < 64) { coefD(Zigzag(z)) = coefZ(z).toDouble * q(Zigzag(z)); z += 1 }
              val px = idct(coefD)
              val ox = (mx * comp.hSamp + bx) * 8
              val oy = (my * comp.vSamp + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(c)((oy + yy) * planeW(c) + ox + xx) =
                    clamp8(px(yy * 8 + xx) + 128.0)
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcusSinceRst += 1
        mx += 1
      }
      my += 1
    }

    // color reconstruction with per-component upsampling
    val pixels = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        def sample(ci: Int): Int = {
          val comp = comps(ci)
          val sx = x * comp.hSamp / hMax
          val sy = y * comp.vSamp / vMax
          planes(ci)(sy * planeW(ci) + sx)
        }
        val rgb =
          if (nC == 1) { val g = sample(0); (g << 16) | (g << 8) | g }
          else {
            val yv = sample(0).toDouble
            val cb = sample(1).toDouble - 128.0
            val cr = sample(2).toDouble - 128.0
            val r = clamp8(yv + 1.402 * cr)
            val g = clamp8(yv - 0.344136 * cb - 0.714136 * cr)
            val bl = clamp8(yv + 1.772 * cb)
            (r << 16) | (g << 8) | bl
          }
        pixels(y * width + x) = rgb
        x += 1
      }
      y += 1
    }
    Some(JpegImage(width, height, pixels))
  }
}
