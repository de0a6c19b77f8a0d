package graft.ext

/** Real, dependency-free media codecs (pure JVM byte parsing) for the two
  * formats whose containers are simple enough to need no library: RIFF/WAVE
  * PCM audio and uncompressed 24-bit BMP images. These replace the
  * `Multimodal.decodeStub` fallback for `kind` "wav"/"bmp", making the
  * multimodal pipeline's decode step REAL for those formats — parse,
  * feature-extract (RMS energy, zero crossings, luminance), and transform
  * (nearest-neighbor resize) all run distributed on binary columns.
  *
  * Everything is sequential deterministic arithmetic, so extracted features
  * are stable across partitionings and (for synthesis-parameter features)
  * oracle-checkable end to end (`m_wav_roundtrip`).
  */
object MediaCodecs {

  // ---- little-endian helpers ----------------------------------------------

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b.length >= off + 4 && b(off) == t(0).toByte && b(off + 1) == t(1).toByte &&
      b(off + 2) == t(2).toByte && b(off + 3) == t(3).toByte

  // ---- WAV (RIFF/WAVE, PCM16) ---------------------------------------------

  /** Decoded PCM audio: container fields + signal features computed over
    * channel 0 (samples normalized to [-1, 1)).
    */
  final case class WavInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int, nSamples: Int,
      durationSec: Double, rms: Double, zeroCrossings: Int)

  /** Parse a RIFF/WAVE PCM16 payload; None for anything else (wrong magic,
    * compressed format, truncated chunks).
    */
  def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 44 || !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE"))
      return None
    var off = 12
    var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val size = le32(bytes, off + 4)
      // a corrupt size field must not stall (size = -8 would advance off by
      // zero — infinite loop on an executor) or walk off negative
      if (size < 0) return None
      if (tag(bytes, off, "fmt ") && off + 8 + 16 <= bytes.length) {
        val audioFormat = le16(bytes, off + 8)
        if (audioFormat != 1) return None // PCM only
        channels = le16(bytes, off + 10)
        sampleRate = le32(bytes, off + 12)
        bits = le16(bytes, off + 22)
      } else if (tag(bytes, off, "data")) {
        dataOff = off + 8; dataLen = math.min(size, bytes.length - dataOff)
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (channels <= 0 || sampleRate <= 0 || bits != 16 || dataOff < 0) return None
    val frameBytes = channels * 2
    val nSamples = dataLen / frameBytes
    var sumSq = 0.0; var zc = 0; var prevNeg = false
    var i = 0
    while (i < nSamples) {
      val raw = le16(bytes, dataOff + i * frameBytes)
      val s = (if (raw >= 0x8000) raw - 0x10000 else raw) / 32768.0 // channel 0
      sumSq += s * s
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      i += 1
    }
    val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
    Some(WavInfo(channels, sampleRate, bits, nSamples,
      nSamples.toDouble / sampleRate, rms, zc))
  }

  /** Channel-0 RAW signed samples of a RIFF/WAVE PCM16 payload (the
    * integer values, not [[parseWav]]'s normalized aggregates) — the
    * access path for integer-exact signal hashing (audio fingerprints).
    * None for anything parseWav rejects. */
  def wavSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    if (parseWav(bytes).isEmpty) return None
    var off = 12
    var channels = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val size = le32(bytes, off + 4)
      if (size < 0) return None
      if (tag(bytes, off, "fmt ") && off + 8 + 16 <= bytes.length)
        channels = le16(bytes, off + 10)
      else if (tag(bytes, off, "data")) {
        dataOff = off + 8; dataLen = math.min(size, bytes.length - dataOff)
      }
      off += 8 + size + (size & 1)
    }
    val frameBytes = channels * 2
    val n = dataLen / frameBytes
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val raw = le16(bytes, dataOff + i * frameBytes)
      out(i) = if (raw >= 0x8000) raw - 0x10000 else raw
      i += 1
    }
    Some(out)
  }

  /** Write a mono PCM16 RIFF/WAVE payload — the synthesis side of the
    * decode round-trip (m_wav_roundtrip and specs). */
  def writeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes.copyToArray(out, 0)
    putLe32(out, 4, 36 + dataLen)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12)
    putLe32(out, 16, 16)      // fmt chunk size
    putLe16(out, 20, 1)       // PCM
    putLe16(out, 22, 1)       // mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * 2) // byte rate
    putLe16(out, 32, 2)       // block align
    putLe16(out, 34, 16)      // bits
    "data".getBytes.copyToArray(out, 36)
    putLe32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(out, 44 + i * 2, samples(i) & 0xffff); i += 1
    }
    out
  }

  // ---- BMP (uncompressed 24-bit) ------------------------------------------

  /** Decoded image: dimensions + mean luminance (ITU-R 601 weights over all
    * pixels, deterministic row-major accumulation). */
  final case class BmpInfo(
      width: Int, height: Int, bitsPerPixel: Int, meanLuminance: Double)

  private def bmpRowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Parse an uncompressed 24bpp BMP; None otherwise. Handles the standard
    * bottom-up row order (positive height). */
  def parseBmp(bytes: Array[Byte]): Option[BmpInfo] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      return None
    val dataOff = le32(bytes, 10)
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || height <= 0) return None
    // negative offsets and width*3 Int overflow would slip past the length
    // check below and index out of bounds in the pixel loop
    if (dataOff < 54 || width > (Int.MaxValue - 3) / 3) return None
    val rowSize = bmpRowSize(width)
    if (dataOff + rowSize.toLong * height > bytes.length) return None
    var sum = 0.0
    var y = 0
    while (y < height) {
      val row = dataOff + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val b = bytes(row + x * 3) & 0xff
        val g = bytes(row + x * 3 + 1) & 0xff
        val r = bytes(row + x * 3 + 2) & 0xff
        sum += 0.299 * r + 0.587 * g + 0.114 * b
        x += 1
      }
      y += 1
    }
    Some(BmpInfo(width, height, bpp, sum / (width.toLong * height)))
  }

  /** Write an uncompressed 24bpp BMP from an (x, y) → (r, g, b) function —
    * synthesis side for specs and round-trip queries. */
  def writeBmp24(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = bmpRowSize(width)
    val dataLen = rowSize * height
    val out = new Array[Byte](54 + dataLen)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putLe32(out, 2, out.length)
    putLe32(out, 10, 54)
    putLe32(out, 14, 40)     // BITMAPINFOHEADER
    putLe32(out, 18, width)
    putLe32(out, 22, height) // positive = bottom-up
    putLe16(out, 26, 1)      // planes
    putLe16(out, 28, 24)     // bpp
    putLe32(out, 34, dataLen)
    var y = 0
    while (y < height) {
      val row = 54 + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(row + x * 3) = (b & 0xff).toByte
        out(row + x * 3 + 1) = (g & 0xff).toByte
        out(row + x * 3 + 2) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- PNG (non-interlaced 8-bit RGB/RGBA, zlib via java.util.zip) --------

  /** Decoded PNG: IHDR fields + mean luminance (ITU-R 601 over RGB,
    * alpha ignored, deterministic row-major accumulation). */
  final case class PngInfo(
      width: Int, height: Int, bitDepth: Int, colorType: Int,
      meanLuminance: Double)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 24) & 0xff).toByte; b(off + 1) = ((v >> 16) & 0xff).toByte
    b(off + 2) = ((v >> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
  }
  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a non-interlaced 8-bit-depth truecolor PNG (color type 2 = RGB
    * or 6 = RGBA); None for anything else (wrong magic, palette/gray,
    * interlaced, corrupt chunk sizes, bad zlib stream, short pixel data).
    * The zlib inflate is `java.util.zip.Inflater` — no libraries — and all
    * five scanline filter types (None/Sub/Up/Average/Paeth) unfilter.
    */
  def parsePng(bytes: Array[Byte]): Option[PngInfo] = {
    if (bytes.length < PngSig.length + 25 ||
      !PngSig.indices.forall(i => bytes(i) == PngSig(i))) return None
    var off = 8
    var width = 0; var height = 0; var bitDepth = 0; var colorType = -1
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    while (off + 8 <= bytes.length) {
      val len = be32(bytes, off)
      // corrupt negative length: off would stop advancing (infinite loop)
      if (len < 0 || off + 12L + len > bytes.length) return None
      val isType = (t: String) => tag(bytes, off + 4, t)
      if (isType("IHDR")) {
        if (len < 13) return None
        width = be32(bytes, off + 8)
        height = be32(bytes, off + 12)
        bitDepth = bytes(off + 16) & 0xff
        colorType = bytes(off + 17) & 0xff
        val interlace = bytes(off + 20) & 0xff
        if (bitDepth != 8 || (colorType != 2 && colorType != 6) ||
          interlace != 0 || width <= 0 || height <= 0) return None
        if (width > (Int.MaxValue - 8) / 8 / math.max(1, height)) return None
        sawIhdr = true
      } else if (isType("IDAT")) {
        idat.write(bytes, off + 8, len)
      } else if (isType("IEND")) {
        off = bytes.length // stop
      }
      if (off < bytes.length) off += 12 + len
    }
    if (!sawIhdr || idat.size() == 0) return None
    val bpp = if (colorType == 2) 3 else 4
    val stride = width * bpp
    val rawLen = (1L + stride) * height
    // refuse implausible dims BEFORE allocating: deflate tops out at
    // ~1032:1, so a decode buffer beyond that multiple of the actual IDAT
    // bytes can only come from corrupt/crafted IHDR dims — without this a
    // 100-byte payload declaring height=2^28 allocates ~1 GB per row
    if (rawLen > idat.size().toLong * 1032L + 64L) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // n == 0 && !finished covers BOTH truncated streams (needsInput)
        // and preset-dictionary streams (needsDictionary, FDICT flag) —
        // checking needsInput alone spins forever on the latter
        if (n == 0) return None
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // unfilter in place into `pix` (rows without the leading filter byte)
    val pix = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = raw((1 + stride) * y) & 0xff
      if (f > 4) return None
      val rowIn = (1 + stride) * y + 1
      val rowOut = stride * y
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val a = if (x >= bpp) pix(rowOut + x - bpp) & 0xff else 0
        val b = if (y > 0) pix(rowOut - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) pix(rowOut - stride + x - bpp) & 0xff else 0
        val rec = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        pix(rowOut + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }

    var sum = 0.0
    var i = 0
    while (i < pix.length) {
      val r = pix(i) & 0xff; val g = pix(i + 1) & 0xff; val b = pix(i + 2) & 0xff
      sum += 0.299 * r + 0.587 * g + 0.114 * b
      i += bpp
    }
    Some(PngInfo(width, height, bitDepth, colorType,
      sum / (width.toLong * height)))
  }

  /** Write an 8-bit RGB (color type 2) non-interlaced PNG from an
    * (x, y) → (r, g, b) function. `filterOfRow` picks the scanline filter
    * (0-4) per row — the encoder applies the filter transform, so a
    * round-trip through [[parsePng]] exercises every unfilter path.
    */
  def writePngRgb(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int),
      filterOfRow: Int => Int = _ => 0): Array[Byte] = {
    val stride = width * 3
    val raw = new Array[Byte]((1 + stride) * height)
    val pix = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        pix(stride * y + x * 3) = (r & 0xff).toByte
        pix(stride * y + x * 3 + 1) = (g & 0xff).toByte
        pix(stride * y + x * 3 + 2) = (b & 0xff).toByte
        x += 1
      }
      y += 1
    }
    y = 0
    while (y < height) {
      val f = filterOfRow(y)
      require(f >= 0 && f <= 4, s"bad filter $f")
      raw((1 + stride) * y) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = pix(stride * y + x) & 0xff
        val a = if (x >= 3) pix(stride * y + x - 3) & 0xff else 0
        val b = if (y > 0) pix(stride * (y - 1) + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) pix(stride * (y - 1) + x - 3) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw((1 + stride) * y + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }

    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) comp.write(buf, 0, def_.deflate(buf))
    def_.end()
    val idat = comp.toByteArray

    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      putBe32(out, 0, data.length)
      typ.getBytes("US-ASCII").copyToArray(out, 4)
      data.copyToArray(out, 8)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 4, 4 + data.length)
      putBe32(out, 8 + data.length, crc.getValue.toInt)
      out
    }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolor RGB
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Nearest-neighbor resize of a 24bpp BMP — a REAL binary → binary media
    * transform (replaces resizeStub for BMP payloads). */
  def resizeBmpNearest(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    parseBmp(bytes).map { info =>
      val dataOff = le32(bytes, 10)
      val rowSize = bmpRowSize(info.width)
      writeBmp24(newW, newH, (x, y) => {
        val sx = (x.toLong * info.width / newW).toInt
        val sy = (y.toLong * info.height / newH).toInt
        val row = dataOff + (info.height - 1 - sy) * rowSize
        val b = bytes(row + sx * 3) & 0xff
        val g = bytes(row + sx * 3 + 1) & 0xff
        val r = bytes(row + sx * 3 + 2) & 0xff
        (r, g, b)
      })
    }

  /** Random pixel access into a validated 24bpp BMP: (width, height,
    * (x, y) → (r, g, b)) with (0,0) the TOP-LEFT pixel (the accessor
    * undoes BMP's bottom-up row order). None for anything parseBmp
    * rejects. The closure captures only offsets — safe to call per pixel
    * in a tight loop (perceptual hashing, feature grids). */
  def bmpPixels(
      bytes: Array[Byte]): Option[(Int, Int, (Int, Int) => (Int, Int, Int))] =
    parseBmp(bytes).map { info =>
      val dataOff = le32(bytes, 10)
      val rowSize = bmpRowSize(info.width)
      (info.width, info.height, (x: Int, y: Int) => {
        val row = dataOff + (info.height - 1 - y) * rowSize
        val b = bytes(row + x * 3) & 0xff
        val g = bytes(row + x * 3 + 1) & 0xff
        val r = bytes(row + x * 3 + 2) & 0xff
        (r, g, b)
      })
    }

  // ---- JPEG (JFIF marker scan — metadata only) ----------------------------

  /** JPEG frame metadata recovered from the SOF marker. Full entropy decode
    * needs a codec library this container lacks; dimensions/components are
    * plain header fields every spec-conforming JFIF stream carries, so
    * METADATA extraction is real (works on any actual JPEG file). */
  final case class JpegInfo(width: Int, height: Int, nComponents: Int)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Scan JFIF markers to the first SOFn (C0-CF except the non-frame C4
    * DHT / C8 JPG / CC DAC) and read its precision/height/width/components
    * fields. None on wrong magic, truncation, or SOS/EOI before any SOF.
    */
  def parseJpegMeta(b: Array[Byte]): Option[JpegInfo] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None // not SOI
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None // marker desync
      val m = b(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before SOF
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn payload: precision u8, height u16, width u16, nComponents u8
          if (len < 8) return None
          return Some(JpegInfo(be16(b, i + 7), be16(b, i + 5), b(i + 9) & 0xff))
        }
        i += 2 + len
      }
    }
    None
  }

  /** A structurally valid JFIF header stream (SOI + APP0 + SOF0 + EOI) with
    * the given frame dimensions and 3 components — the synthesis fixture for
    * [[parseJpegMeta]] round-trip gates. Scan data is deliberately absent
    * (entropy coding needs a codec lib); the parser never reads past SOF.
    * Size is closed-form: 2 + 18 + 19 + 2 = 41 bytes, which the oracle
    * recomputes.
    */
  def writeJpegShell(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(41)
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, Array[Byte]( // APP0: JFIF 1.01, no thumbnail
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val sof = new Array[Byte](15) // precision + dims + 3 component specs
    sof(0) = 8
    sof(1) = ((h >> 8) & 0xff).toByte; sof(2) = (h & 0xff).toByte
    sof(3) = ((w >> 8) & 0xff).toByte; sof(4) = (w & 0xff).toByte
    sof(5) = 3
    var c = 0
    while (c < 3) { // id, sampling 1x1, quant table 0
      sof(6 + c * 3) = (c + 1).toByte; sof(7 + c * 3) = 0x11; sof(8 + c * 3) = 0
      c += 1
    }
    marker(0xc0, sof)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- MP4 (ISO BMFF box walk — metadata only) ----------------------------

  /** MP4 presentation metadata from the moov box: movie timescale/duration
    * (mvhd) and track display dimensions (tkhd, 16.16 fixed point). Sample
    * decode needs codec libraries; the box structure is plain length-tagged
    * bytes, so METADATA extraction is real for any actual MP4 file. */
  final case class Mp4Info(
      width: Int, height: Int, timescale: Int, durationTicks: Long)

  private def be32u(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Walk `[size u32][type 4cc]` boxes in `[from, to)` returning the body
    * span of the first box named `name`. Size 1 (64-bit largesize) and
    * size 0 (to-end) are rejected — corrupt or streaming shapes. */
  private def findBox(b: Array[Byte], from: Int, to: Int, name: String)
      : Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val size = be32u(b, i)
      if (size < 8 || i + size > to) return None
      if (tag(b, i + 4, name)) return Some((i + 8, i + size.toInt))
      i += size.toInt
    }
    None
  }

  /** Parse ftyp+moov metadata: mvhd v0 gives timescale/duration, the first
    * trak's tkhd v0 gives display width/height (integer part of 16.16).
    * None on missing magic or malformed/truncated boxes.
    */
  def parseMp4Meta(b: Array[Byte]): Option[Mp4Info] = {
    if (b.length < 12 || !tag(b, 4, "ftyp")) return None
    for {
      (moovFrom, moovTo) <- findBox(b, 0, b.length, "moov")
      (mvhdFrom, mvhdTo) <- findBox(b, moovFrom, moovTo, "mvhd")
      if mvhdTo - mvhdFrom >= 24 && b(mvhdFrom) == 0 // version 0 only
      (trakFrom, trakTo) <- findBox(b, moovFrom, moovTo, "trak")
      (tkhdFrom, tkhdTo) <- findBox(b, trakFrom, trakTo, "tkhd")
      if tkhdTo - tkhdFrom >= 84 && b(tkhdFrom) == 0
    } yield Mp4Info(
      width = (be32u(b, tkhdTo - 8) >> 16).toInt, // 16.16 fixed
      height = (be32u(b, tkhdTo - 4) >> 16).toInt,
      timescale = be32u(b, mvhdFrom + 12).toInt,
      durationTicks = be32u(b, mvhdFrom + 16))
  }

  /** The first sample-entry fourcc of the first track (e.g. "avc1",
    * "hvc1", "mp4a") — the codec identifier a media catalog indexes on,
    * read from the stsd box down the standard trak→mdia→minf→stbl chain.
    * None when the chain is absent (e.g. the minimal [[writeMp4Shell]]
    * fixture carries no mdia) or malformed — never throws.
    */
  def parseMp4Codec(b: Array[Byte]): Option[String] = {
    if (b.length < 12 || !tag(b, 4, "ftyp")) return None
    for {
      (moovFrom, moovTo) <- findBox(b, 0, b.length, "moov")
      (trakFrom, trakTo) <- findBox(b, moovFrom, moovTo, "trak")
      (mdiaFrom, mdiaTo) <- findBox(b, trakFrom, trakTo, "mdia")
      (minfFrom, minfTo) <- findBox(b, mdiaFrom, mdiaTo, "minf")
      (stblFrom, stblTo) <- findBox(b, minfFrom, minfTo, "stbl")
      (stsdFrom, stsdTo) <- findBox(b, stblFrom, stblTo, "stsd")
      // stsd body: version+flags u32, entry_count u32, then entries of
      // [size u32][format 4cc]...
      if stsdTo - stsdFrom >= 16 && be32u(b, stsdFrom + 4) >= 1
    } yield new String(b, stsdFrom + 12, 4, "US-ASCII")
  }

  /** A minimal valid ISO-BMFF stream (ftyp + moov[mvhd + trak[tkhd]]) — the
    * synthesis fixture for [[parseMp4Meta]] round-trip gates; no mdat
    * (sample data needs codecs; the parser reads only moov). Size is
    * closed-form: ftyp 20 + moov(8 + mvhd 108 + trak(8 + tkhd 92)) = 236
    * bytes, which the oracle recomputes.
    */
  def writeMp4Shell(w: Int, h: Int, timescale: Int, durationTicks: Long)
      : Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(name: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ name.getBytes ++ body
    val mvhd = box("mvhd",
      new Array[Byte](12) ++ // version+flags, ctime, mtime
        be32(timescale) ++ be32(durationTicks) ++
        be32(0x00010000L) ++ // rate 1.0
        new Array[Byte](2 + 2 + 8) ++ // volume, reserved, reserved[2]
        (be32(0x00010000L) ++ be32(0) ++ be32(0) ++
          be32(0) ++ be32(0x00010000L) ++ be32(0) ++
          be32(0) ++ be32(0) ++ be32(0x40000000L)) ++ // identity matrix
        new Array[Byte](24) ++ // pre_defined[6]
        be32(2)) // next_track_ID
    val tkhd = box("tkhd",
      new Array[Byte](12) ++ // version+flags, ctime, mtime
        be32(1) ++ // track_ID
        new Array[Byte](4) ++ // reserved
        be32(durationTicks) ++
        new Array[Byte](8 + 2 + 2 + 2 + 2) ++ // reserved[2], layer, group, volume, reserved
        (be32(0x00010000L) ++ be32(0) ++ be32(0) ++
          be32(0) ++ be32(0x00010000L) ++ be32(0) ++
          be32(0) ++ be32(0) ++ be32(0x40000000L)) ++ // identity matrix
        be32(w.toLong << 16) ++ be32(h.toLong << 16)) // 16.16 fixed
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0x200) ++ "isom".getBytes)
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** [[writeMp4Shell]] extended with the trak→mdia→minf→stbl→stsd chain
    * carrying one sample entry of the given fourcc — the fixture for
    * [[parseMp4Codec]] round-trips. The existing 236-byte shell stays
    * untouched (its size is an oracle-pinned closed form).
    */
  def writeMp4ShellWithCodec(w: Int, h: Int, timescale: Int,
      durationTicks: Long, codec: String): Array[Byte] = {
    require(codec.length == 4, "fourcc required")
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(name: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ name.getBytes ++ body
    val base = writeMp4Shell(w, h, timescale, durationTicks)
    // minimal sample entry: [size][fourcc][6 reserved + 2 data_ref_index]
    val entry = be32(16L) ++ codec.getBytes("US-ASCII") ++ new Array[Byte](8)
    val stsd = box("stsd", be32(0) ++ be32(1) ++ entry)
    val mdia = box("mdia", box("minf", box("stbl", stsd)))
    // splice mdia into the existing trak: rebuild moov = mvhd + trak'
    val (moovFrom, moovTo) = findBox(base, 0, base.length, "moov").get
    val (trakFrom, trakTo) = findBox(base, moovFrom, moovTo, "trak").get
    val trakBody = base.slice(trakFrom, trakTo) ++ mdia
    val mvhdBytes = base.slice(moovFrom, trakFrom - 8)
    base.slice(0, moovFrom - 8) ++
      box("moov", mvhdBytes ++ box("trak", trakBody))
  }

  // ---- MJPEG-in-MP4: real sample tables + sample extraction ---------------

  /** A complete MJPEG mp4 (r10 — retires the mp4 sample-decode stub for
    * ONE real codec): the [[writeMp4Shell]] movie plus a trak carrying the
    * full ISO-BMFF sample machinery — stsd with a "jpeg" sample entry,
    * stts (one run, `ticksPerFrame` per sample), stsc (one chunk holding
    * all samples), stsz (per-frame byte sizes), stco (the chunk's ABSOLUTE
    * file offset) — and an mdat whose body is the concatenated baseline
    * JPEG frames, each independently decodable by [[JpegCodec.decodeJpeg]]
    * (that is what motion-JPEG IS: intra-only frames, no inter prediction,
    * which is why it's the one video codec a pure-JVM engine can do
    * end-to-end). H.264/HEVC sample DECODE stays out of scope
    * (inter-prediction codecs need a codec library); their metadata path
    * ([[parseMp4Meta]]/[[parseMp4Codec]]) is shared with this writer.
    */
  def writeMp4Mjpeg(w: Int, h: Int, timescale: Int, ticksPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(name: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ name.getBytes ++ body
    val durationTicks = frames.length.toLong * ticksPerFrame
    val base = writeMp4Shell(w, h, timescale, durationTicks)
    val entry = be32(16L) ++ "jpeg".getBytes("US-ASCII") ++ new Array[Byte](8)
    val stsd = box("stsd", be32(0) ++ be32(1) ++ entry)
    val stts = box("stts",
      be32(0) ++ be32(1) ++ be32(frames.length) ++ be32(ticksPerFrame))
    val stsc = box("stsc",
      be32(0) ++ be32(1) ++ be32(1) ++ be32(frames.length) ++ be32(1))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames.length) ++
      frames.toArray.flatMap(f => be32(f.length)))
    // stco carries the mdat BODY's absolute offset; its own size is
    // offset-independent, so assemble once with a placeholder to measure,
    // then once with the real value
    def assemble(chunkOffset: Long): Array[Byte] = {
      val stco = box("stco", be32(0) ++ be32(1) ++ be32(chunkOffset))
      val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val mdia = box("mdia", box("minf", stbl))
      val (moovFrom, moovTo) = findBox(base, 0, base.length, "moov").get
      val (trakFrom, trakTo) = findBox(base, moovFrom, moovTo, "trak").get
      val trakBody = base.slice(trakFrom, trakTo) ++ mdia
      val mvhdBytes = base.slice(moovFrom, trakFrom - 8)
      base.slice(0, moovFrom - 8) ++
        box("moov", mvhdBytes ++ box("trak", trakBody))
    }
    val prefixLen = assemble(0L).length + 8 // + mdat header
    assemble(prefixLen.toLong) ++
      box("mdat", frames.toArray.flatten)
  }

  /** Raw sample payloads of the first track, reconstructed from the
    * standard stsz/stsc/stco walk (general ISO-BMFF: any chunking, uniform
    * or per-sample sizes) — codec-agnostic byte extraction; pair with
    * [[parseMp4Codec]] to dispatch an actual decoder per fourcc. None on
    * missing/malformed tables, out-of-file offsets, or absurd counts
    * (> 65536 samples — a fuzz guard, real clips chunk long before that);
    * never throws.
    */
  def readMp4Samples(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (b.length < 12 || !tag(b, 4, "ftyp")) return None
    for {
      (moovFrom, moovTo) <- findBox(b, 0, b.length, "moov")
      (trakFrom, trakTo) <- findBox(b, moovFrom, moovTo, "trak")
      (mdiaFrom, mdiaTo) <- findBox(b, trakFrom, trakTo, "mdia")
      (minfFrom, minfTo) <- findBox(b, mdiaFrom, mdiaTo, "minf")
      (stblFrom, stblTo) <- findBox(b, minfFrom, minfTo, "stbl")
      (stszFrom, stszTo) <- findBox(b, stblFrom, stblTo, "stsz")
      (stscFrom, stscTo) <- findBox(b, stblFrom, stblTo, "stsc")
      (stcoFrom, stcoTo) <- findBox(b, stblFrom, stblTo, "stco")
      samples <- walkSampleTables(b, stszFrom, stszTo, stscFrom, stscTo,
        stcoFrom, stcoTo)
    } yield samples
  }

  private def walkSampleTables(b: Array[Byte], stszFrom: Int, stszTo: Int,
      stscFrom: Int, stscTo: Int, stcoFrom: Int, stcoTo: Int)
      : Option[Seq[Array[Byte]]] = {
    // stsz: version+flags, uniform sample_size (0 = per-sample), count
    if (stszTo - stszFrom < 12) return None
    val uniform = be32u(b, stszFrom + 4)
    val nSamples = be32u(b, stszFrom + 8)
    if (nSamples < 1 || nSamples > 65536) return None
    val n = nSamples.toInt
    if (uniform == 0 && stszTo - stszFrom < 12 + 4L * n) return None
    def sizeOf(i: Int): Long =
      if (uniform != 0) uniform else be32u(b, stszFrom + 12 + 4 * i)
    // stco: version+flags, entry_count, offsets
    if (stcoTo - stcoFrom < 8) return None
    val nChunks = be32u(b, stcoFrom + 4)
    if (nChunks < 1 || nChunks > 65536 ||
      stcoTo - stcoFrom < 8 + 4L * nChunks) return None
    def chunkOffset(c: Int): Long = be32u(b, stcoFrom + 8 + 4 * c)
    // stsc: version+flags, entry_count, (first_chunk, samples_per_chunk,
    // desc_idx) runs — first_chunk is 1-based and strictly increasing
    if (stscTo - stscFrom < 8) return None
    val nRuns = be32u(b, stscFrom + 4)
    if (nRuns < 1 || stscTo - stscFrom < 8 + 12L * nRuns) return None
    def runFirstChunk(r: Int): Long = be32u(b, stscFrom + 8 + 12 * r)
    def runPerChunk(r: Int): Long = be32u(b, stscFrom + 12 + 12 * r)
    val out = Seq.newBuilder[Array[Byte]]
    var sample = 0
    var run = 0
    var chunk = 0 // 0-based
    while (sample < n && chunk < nChunks.toInt) {
      while (run + 1 < nRuns.toInt && runFirstChunk(run + 1) <= chunk + 1)
        run += 1
      val perChunk = runPerChunk(run)
      if (perChunk < 1 || perChunk > 65536) return None
      var off = chunkOffset(chunk)
      var i = 0L
      while (i < perChunk && sample < n) {
        val sz = sizeOf(sample)
        if (sz < 1 || off + sz > b.length) return None
        out += java.util.Arrays.copyOfRange(b, off.toInt, (off + sz).toInt)
        off += sz
        sample += 1
        i += 1
      }
      chunk += 1
    }
    if (sample < n) None else Some(out.result())
  }
}
