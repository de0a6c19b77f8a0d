package graft.ext

import java.io.ByteArrayOutputStream

/** Pure-JVM GIF87a/89a codec — encoder and decoder — implementing the
  * public CompuServe GIF89a specification (logical screen descriptor,
  * global/local color tables, image descriptors, extension blocks,
  * variable-width LZW with clear/EOI codes capped at 12 bits, interlace
  * pass order). Completes the lossless arm of the media family
  * (BMP/PNG/WAV + lossy JPEG): GIF round-trips palette images EXACTLY,
  * so its gate row pins bit-identical pixels, not a bounded error.
  *
  * Robustness contract (shared with [[JpegCodec]]): `decodeGif` and
  * `parseGifMeta` never throw on arbitrary bytes — every read is
  * bounds-checked, dimensions are capped before allocation (the r9 JPEG
  * lesson: an OOM escapes a Try), and malformed streams return None.
  * Strictness posture: a corrupt LZW stream aborts the frame (None)
  * rather than emitting partial pixels — GIF has no restart markers, so
  * unlike JPEG there is no resync point to salvage from.
  *
  * Scale shape: like the rest of the media family, bytes never shuffle —
  * synth/decode run inside one narrow mapPartitions; only extracted
  * features move.
  */
object GifCodec {

  /** One decoded frame: `palette` holds 0xRRGGBB ints; `indices` is the
    * row-major pixel→palette map (already deinterlaced if the frame was
    * stored interlaced). Frames are standalone (their own w×h); sub-rect
    * placement on the logical screen is reported via (left, top), not
    * composited.
    */
  final case class GifImage(width: Int, height: Int, left: Int, top: Int,
      palette: Array[Int], indices: Array[Byte]) {
    def rgb(x: Int, y: Int): Int = palette(indices(y * width + x) & 0xff)
    def r(x: Int, y: Int): Int = (rgb(x, y) >> 16) & 0xff
    def g(x: Int, y: Int): Int = (rgb(x, y) >> 8) & 0xff
    def b(x: Int, y: Int): Int = rgb(x, y) & 0xff
  }

  final case class GifInfo(width: Int, height: Int, gctSize: Int,
      nFrames: Int, animated: Boolean)

  /** Pixel-count allocation cap (16M) — malformed dims fail fast instead
    * of OOMing past the caller's recovery. */
  private val MaxPixels = 1 << 24

  /** Encoder-side dimension guard: GIF stores w/h as u16, so a larger
    * value would silently truncate in le16 and emit a descriptor that
    * contradicts the LZW payload; and anything over MaxPixels could not
    * be decoded by this codec's own decoder. Throw at encode time. */
  private def requireDims(width: Int, height: Int): Unit = {
    require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
      s"GIF dimensions are u16: got ${width}x$height")
    require(width.toLong * height <= MaxPixels,
      s"${width}x$height exceeds the ${MaxPixels}-pixel decode cap")
  }

  // ---------------------------------------------------------------- encode

  /** Write a single-frame GIF89a: one global color table (padded to a
    * power of two), one non-transparent image covering the full screen.
    * `indices(y*width+x)` selects into `palette` (0xRRGGBB). With
    * `interlaced` the rows are stored in the spec's four-pass order.
    */
  def writeGif(width: Int, height: Int, palette: Array[Int],
      indices: Array[Byte], interlaced: Boolean = false): Array[Byte] = {
    requireDims(width, height)
    require(palette.length >= 2 && palette.length <= 256, "palette 2..256")
    require(indices.length == width * height, "indices = w*h")
    val out = new ByteArrayOutputStream()
    writeHeaderAndGct(out, width, height, palette)
    writeFrame(out, width, height, 0, 0, palette, indices, interlaced)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Write an animated GIF89a: NETSCAPE2.0 infinite-loop application
    * extension, then per frame a graphic-control extension carrying
    * `delayCs` (centiseconds) and a full-screen image. All frames share
    * the global color table.
    */
  def writeGifAnimated(width: Int, height: Int, palette: Array[Int],
      frames: Seq[Array[Byte]], delayCs: Int): Array[Byte] = {
    requireDims(width, height)
    require(palette.length >= 2 && palette.length <= 256, "palette 2..256")
    require(frames.nonEmpty && frames.forall(_.length == width * height))
    val out = new ByteArrayOutputStream()
    writeHeaderAndGct(out, width, height, palette)
    // application extension: NETSCAPE2.0, loop forever
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); out.write(0); out.write(0) // loop count 0
    out.write(0)
    frames.foreach { fr =>
      // graphic control extension: no disposal, no transparency
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0)
      out.write(delayCs & 0xff); out.write((delayCs >> 8) & 0xff)
      out.write(0); out.write(0)
      writeFrame(out, width, height, 0, 0, palette, fr, interlaced = false)
    }
    out.write(0x3b)
    out.toByteArray
  }

  private def writeHeaderAndGct(out: ByteArrayOutputStream, width: Int,
      height: Int, palette: Array[Int]): Unit = {
    out.write("GIF89a".getBytes("US-ASCII"))
    val gctBits = colorBits(palette.length)
    le16(out, width); le16(out, height)
    // packed: GCT present, color resolution 8 bits, GCT size 2^(bits)
    out.write(0x80 | (7 << 4) | (gctBits - 1))
    out.write(0) // background color index
    out.write(0) // aspect ratio
    var i = 0
    val n = 1 << gctBits
    while (i < n) {
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
      i += 1
    }
  }

  private def writeFrame(out: ByteArrayOutputStream, width: Int, height: Int,
      left: Int, top: Int, palette: Array[Int], indices: Array[Byte],
      interlaced: Boolean): Unit = {
    out.write(0x2c)
    le16(out, left); le16(out, top); le16(out, width); le16(out, height)
    out.write(if (interlaced) 0x40 else 0) // no LCT
    val stored =
      if (!interlaced) indices
      else { // write rows in interlace pass order
        val dst = new Array[Byte](indices.length)
        var o = 0
        interlaceRows(height).foreach { y =>
          System.arraycopy(indices, y * width, dst, o * width, width)
          o += 1
        }
        dst
      }
    val minCode = math.max(2, colorBits(palette.length))
    out.write(minCode)
    val lzw = lzwEncode(minCode, stored)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0) // block terminator
  }

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** Bits needed to index a palette of n colors (>= 1 per the GIF field). */
  private def colorBits(n: Int): Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(1, n - 1)))

  /** GIF interlace pass order: rows 0,8,16…, 4,12…, 2,6…, 1,3,5… */
  private def interlaceRows(height: Int): Seq[Int] =
    (0 until height by 8) ++ (4 until height by 8) ++
      (2 until height by 4) ++ (1 until height by 2)

  /** Variable-width LZW (GIF flavor: no early-change): codes are packed
    * LSB-first; the width grows when the next code to ASSIGN no longer
    * fits the current width (encoder: next == (1<<size)+1 after assign —
    * one entry later than the decoder's next == 1<<size, because the
    * decoder's table lags the encoder's by exactly one entry); a full
    * table (4096) emits CLEAR and restarts.
    */
  private def lzwEncode(minCode: Int, data: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += codeSize
      while (nBits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
    }
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    put(clear)
    if (data.nonEmpty) {
      var prefix: Int = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key: Integer = (prefix << 8) | k
        val hit = dict.get(key)
        if (hit != null) prefix = hit
        else {
          put(prefix)
          if (next < 4096) {
            dict.put(key, next)
            next += 1
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else { // table full: hard reset (decoder mirrors on CLEAR)
            put(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1
            codeSize = minCode + 1
          }
          prefix = k
        }
        i += 1
      }
      put(prefix)
    }
    put(eoi)
    if (nBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Decode the FIRST image frame. None on wrong magic, truncation,
    * malformed LZW, dims over the allocation cap, or an index outside the
    * active color table.
    */
  def decodeGif(bytes: Array[Byte]): Option[GifImage] =
    decodeFrames(bytes, maxFrames = 1).flatMap(_.headOption)

  /** Decode ALL frames (animation support). None if the container is
    * malformed before the first frame; a malformed LATER frame truncates
    * the sequence at the last good frame (partial animations are the
    * common real-world corruption).
    */
  def decodeGifFrames(bytes: Array[Byte]): Option[Seq[GifImage]] =
    decodeFrames(bytes, maxFrames = Int.MaxValue)

  /** Container metadata without pixel decode: logical screen dims, global
    * color table size (0 = none), frame count, animated flag. Walks every
    * block, skipping LZW payloads.
    */
  def parseGifMeta(bytes: Array[Byte]): Option[GifInfo] = {
    val h = parseHeader(bytes).getOrElse(return None)
    var pos = h.pos
    var frames = 0
    var ok = true
    var done = false
    while (!done && ok) {
      if (pos >= bytes.length) { ok = frames > 0; done = true }
      else (bytes(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          skipSubBlocks(bytes, pos + 2) match {
            case Some(p) => pos = p
            case None => ok = false
          }
        case 0x2c =>
          skipFrame(bytes, pos) match {
            case Some(p) => frames += 1; pos = p
            case None => ok = false
          }
        case _ => ok = false
      }
    }
    if (ok && frames > 0)
      Some(GifInfo(h.width, h.height, h.gct.map(_.length).getOrElse(0),
        frames, frames > 1))
    else None
  }

  private final case class Header(width: Int, height: Int,
      gct: Option[Array[Int]], pos: Int)

  private def parseHeader(b: Array[Byte]): Option[Header] = {
    if (b.length < 13) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF89a" && magic != "GIF87a") return None
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    val packed = b(10) & 0xff
    var pos = 13
    val gct =
      if ((packed & 0x80) != 0) {
        val n = 1 << ((packed & 7) + 1)
        if (pos + 3 * n > b.length) return None
        val t = new Array[Int](n)
        var i = 0
        while (i < n) {
          t(i) = ((b(pos) & 0xff) << 16) | ((b(pos + 1) & 0xff) << 8) |
            (b(pos + 2) & 0xff)
          pos += 3; i += 1
        }
        Some(t)
      } else None
    Some(Header(w, h, gct, pos))
  }

  private def skipSubBlocks(b: Array[Byte], from: Int): Option[Int] = {
    var pos = from
    while (true) {
      if (pos >= b.length) return None
      val n = b(pos) & 0xff
      if (n == 0) return Some(pos + 1)
      pos += 1 + n
    }
    None
  }

  private def skipFrame(b: Array[Byte], at: Int): Option[Int] = {
    if (at + 10 > b.length) return None
    val packed = b(at + 9) & 0xff
    var pos = at + 10
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
    if (pos + 1 > b.length) return None
    skipSubBlocks(b, pos + 1) // + LZW min code byte
  }

  private def decodeFrames(b: Array[Byte], maxFrames: Int): Option[Seq[GifImage]] = {
    val h = parseHeader(b).getOrElse(return None)
    var pos = h.pos
    val frames = Seq.newBuilder[GifImage]
    var n = 0
    var done = false
    while (!done && n < maxFrames) {
      if (pos >= b.length) { done = true; if (n == 0) return None }
      else (b(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 =>
          skipSubBlocks(b, pos + 2) match {
            case Some(p) => pos = p
            case None => if (n == 0) return None else done = true
          }
        case 0x2c =>
          decodeOneFrame(b, pos, h.gct) match {
            case Some((img, p)) => frames += img; n += 1; pos = p
            case None => if (n == 0) return None else done = true
          }
        case _ => if (n == 0) return None else done = true
      }
    }
    if (n == 0) None else Some(frames.result())
  }

  private def decodeOneFrame(b: Array[Byte], at: Int,
      gct: Option[Array[Int]]): Option[(GifImage, Int)] = {
    if (at + 10 > b.length) return None
    def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val left = u16(at + 1); val top = u16(at + 3)
    val w = u16(at + 5); val h = u16(at + 7)
    val packed = b(at + 9) & 0xff
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    var pos = at + 10
    val palette: Array[Int] =
      if ((packed & 0x80) != 0) {
        val nc = 1 << ((packed & 7) + 1)
        if (pos + 3 * nc > b.length) return None
        val t = new Array[Int](nc)
        var i = 0
        while (i < nc) {
          t(i) = ((b(pos) & 0xff) << 16) | ((b(pos + 1) & 0xff) << 8) |
            (b(pos + 2) & 0xff)
          pos += 3; i += 1
        }
        t
      } else gct.getOrElse(return None)
    if (pos >= b.length) return None
    val minCode = b(pos) & 0xff
    if (minCode < 2 || minCode > 11) return None
    pos += 1
    // concatenate LZW sub-blocks
    val lzw = new ByteArrayOutputStream()
    var blockEnd = -1
    while (blockEnd < 0) {
      if (pos >= b.length) return None
      val bn = b(pos) & 0xff
      if (bn == 0) blockEnd = pos + 1
      else {
        if (pos + 1 + bn > b.length) return None
        lzw.write(b, pos + 1, bn)
        pos = pos + 1 + bn
      }
    }
    val indices = lzwDecode(minCode, lzw.toByteArray, w * h, palette.length)
      .getOrElse(return None)
    val out =
      if ((packed & 0x40) != 0) { // deinterlace
        val dst = new Array[Byte](indices.length)
        var src = 0
        interlaceRows(h).foreach { y =>
          System.arraycopy(indices, src * w, dst, y * w, w)
          src += 1
        }
        dst
      } else indices
    Some((GifImage(w, h, left, top, palette, out), blockEnd))
  }

  /** LZW decode to exactly `nPixels` indices, each < `nColors`. None on a
    * code past the table, an out-of-range index, or a stream that ends
    * before the pixel count is met (no EOI salvage — see class doc).
    */
  private def lzwDecode(minCode: Int, data: Array[Byte], nPixels: Int,
      nColors: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    // table as (prefix code, suffix byte) pairs; root codes have prefix -1
    val prefixOf = new Array[Int](4096)
    val suffixOf = new Array[Byte](4096)
    var next = eoi + 1
    var codeSize = minCode + 1
    var prev = -1
    var acc = 0L
    var nBits = 0
    var bytePos = 0
    val stack = new Array[Byte](4096)
    def emit(code: Int): Boolean = { // expand code onto out; false = invalid
      var sp = 0
      var c = code
      while (c >= clear) { // composite codes expand through the chain
        if (sp >= stack.length || c >= next) return false
        stack(sp) = suffixOf(c); sp += 1
        c = prefixOf(c)
      }
      if (c >= nColors) return false
      if (outPos + sp + 1 > nPixels) return false
      out(outPos) = c.toByte; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefixOf(c)
      c.toByte
    }
    while (outPos < nPixels) {
      while (nBits < codeSize) {
        if (bytePos >= data.length) return None
        acc |= (data(bytePos) & 0xffL) << nBits
        bytePos += 1; nBits += 8
      }
      val code = (acc & ((1L << codeSize) - 1)).toInt
      acc >>= codeSize; nBits -= codeSize
      if (code == clear) {
        next = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        return None // EOI before the pixel count was met
      } else if (prev == -1) {
        if (code >= clear || code >= nColors) return None
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > next) return None
        if (code == next) { // KwKwK: str(prev) + first(str(prev))
          if (next >= 4096) return None
          prefixOf(next) = prev; suffixOf(next) = firstByte(prev)
          next += 1
          if (!emit(next - 1)) return None
        } else {
          if (!emit(code)) return None
          if (next < 4096) {
            prefixOf(next) = prev; suffixOf(next) = firstByte(code)
            next += 1
          }
        }
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    Some(out)
  }
}
