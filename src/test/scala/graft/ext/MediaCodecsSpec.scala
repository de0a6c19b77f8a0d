package graft.ext

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec round trips: what the encoder wrote, the decoder recovers —
  * byte-exactly for container fields, analytically for signal features.
  */
class MediaCodecsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("WAV PCM16 round-trip recovers container fields and signal features") {
    val sr = 16000; val n = 1000; val freq = 440.0; val amp = 16384
    val samples = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * freq * i / sr) * amp).toShort)
    val info = MediaCodecs.parseWav(MediaCodecs.writeWavPcm16(sr, samples)).get
    assert(info.channels == 1 && info.sampleRate == sr &&
      info.bitsPerSample == 16 && info.nSamples == n)
    assert(math.abs(info.durationSec - n.toDouble / sr) < 1e-12)
    // sine RMS = amp/sqrt(2), normalized by 32768
    val expectedRms = amp / 32768.0 / math.sqrt(2)
    assert(math.abs(info.rms - expectedRms) < 0.01, s"rms ${info.rms}")
    // a 440 Hz sine crosses zero ~2*freq*duration times
    val expectedZc = 2 * freq * n / sr
    assert(math.abs(info.zeroCrossings - expectedZc) <= 2, s"zc ${info.zeroCrossings}")
  }

  test("WAV parser rejects non-WAV and non-PCM payloads") {
    assert(MediaCodecs.parseWav(Array.fill[Byte](100)(7)).isEmpty)
    assert(MediaCodecs.parseWav("RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](40)(0)).isEmpty)
    assert(MediaCodecs.parseWav(Array.emptyByteArray).isEmpty)
  }

  test("malformed chunk sizes neither hang nor crash the parsers") {
    // RIFF chunk size -8 makes the walk advance by ZERO bytes — this input
    // hung the executor forever before the negative-size guard
    val evilWav = MediaCodecs.writeWavPcm16(8000, Array.fill[Short](10)(1))
    evilWav(16) = -8.toByte; evilWav(17) = -1.toByte
    evilWav(18) = -1.toByte; evilWav(19) = -1.toByte // fmt size = -8
    assert(MediaCodecs.parseWav(evilWav).isEmpty)

    // BMP with a negative pixel-data offset indexed out of bounds before
    // the dataOff guard
    val evilBmp = MediaCodecs.writeBmp24(4, 4, (_, _) => (1, 2, 3))
    evilBmp(10) = 0; evilBmp(11) = -1.toByte
    evilBmp(12) = -1.toByte; evilBmp(13) = -1.toByte // dataOff < 0
    assert(MediaCodecs.parseBmp(evilBmp).isEmpty)

    // BMP width large enough to overflow width*3
    val wideBmp = MediaCodecs.writeBmp24(4, 4, (_, _) => (1, 2, 3))
    wideBmp(18) = -1.toByte; wideBmp(19) = -1.toByte
    wideBmp(20) = -1.toByte; wideBmp(21) = 0x7e.toByte // width ~2.1e9
    assert(MediaCodecs.parseBmp(wideBmp).isEmpty)
  }

  test("BMP 24bpp round-trip: dims, padding, exact mean luminance") {
    // width 3 → row padding (9 data bytes + 3 pad) exercises the 4-byte
    // alignment path
    def pix(x: Int, y: Int) = ((x * 50) % 256, (y * 80) % 256, (x + y) % 256)
    val bmp = MediaCodecs.writeBmp24(3, 2, pix)
    val info = MediaCodecs.parseBmp(bmp).get
    assert(info.width == 3 && info.height == 2 && info.bitsPerPixel == 24)
    val expected = (for { y <- 0 until 2; x <- 0 until 3 } yield {
      val (r, g, b) = pix(x, y); 0.299 * r + 0.587 * g + 0.114 * b
    }).sum / 6
    assert(math.abs(info.meanLuminance - expected) < 1e-9)
  }

  test("BMP nearest-neighbor resize maps pixels correctly") {
    def pix(x: Int, y: Int) = (x * 40 % 256, y * 60 % 256, 9)
    val bmp = MediaCodecs.writeBmp24(4, 4, pix)
    val resized = MediaCodecs.resizeBmpNearest(bmp, 2, 2).get
    val info = MediaCodecs.parseBmp(resized).get
    assert(info.width == 2 && info.height == 2)
    // (0,0)→src(0,0), (1,1)→src(2,2): mean luminance of the 4 sampled pixels
    val sampled = Seq((0, 0), (2, 0), (0, 2), (2, 2)).map { case (x, y) =>
      val (r, g, b) = pix(x, y); 0.299 * r + 0.587 * g + 0.114 * b
    }
    assert(math.abs(info.meanLuminance - sampled.sum / 4) < 1e-9)
    assert(MediaCodecs.resizeBmpNearest(Array.fill[Byte](10)(1), 2, 2).isEmpty)
  }

  test("bmpPixels: top-left origin, exact channels, junk rejected") {
    def pix(x: Int, y: Int) = (x * 10 + 1, y * 20 + 2, x + y)
    val bmp = MediaCodecs.writeBmp24(3, 2, pix)
    val (w, h, px) = MediaCodecs.bmpPixels(bmp).get
    assert(w == 3 && h == 2)
    for { y <- 0 until 2; x <- 0 until 3 }
      assert(px(x, y) == pix(x, y), s"pixel ($x,$y)")
    assert(MediaCodecs.bmpPixels(Array.fill[Byte](20)(7)).isEmpty)
  }

  test("imageDHash: brightness-invariant, scene-separating, junk dropped") {
    import SparkTestSession.spark.implicits._
    def scene(p: Int, shift: Int)(x: Int, y: Int) = (
      (x * 53 + y * 31 + p * 41) % 200 + shift,
      (x * 47 + y * 59 + p * 23) % 200 + shift,
      (x * 61 + y * 43 + p * 37) % 200 + shift)
    val rows = Seq(
      Multimodal.MediaRow(0L, "bmp", MediaCodecs.writeBmp24(10, 8, scene(0, 0))),
      // same scene, +25 uniform brightness: byte-wise different file
      Multimodal.MediaRow(1L, "bmp", MediaCodecs.writeBmp24(10, 8, scene(0, 25))),
      // different scene
      Multimodal.MediaRow(2L, "bmp", MediaCodecs.writeBmp24(10, 8, scene(3, 0))),
      // junk: must be dropped, not crash
      Multimodal.MediaRow(3L, "bmp", Array.fill[Byte](30)(1)))
    val out = Multimodal.imageDHash(SparkTestSession.spark
      .createDataset(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L) == out(1L), "brightness shift must not change dHash")
    assert(out(0L) != out(2L), "different scenes must separate")
    assert(out.values.forall(_ >= 0L), "56-bit hash stays non-negative")
  }

  test("wavSamples: raw channel-0 integers round-trip; junk rejected") {
    val samples = Array.tabulate(50)(i => ((i * 991) % 30000 - 15000).toShort)
    val wav = MediaCodecs.writeWavPcm16(8000, samples)
    assert(MediaCodecs.wavSamples(wav).get.toSeq == samples.map(_.toInt).toSeq)
    assert(MediaCodecs.wavSamples(Array.fill[Byte](50)(3)).isEmpty)
  }

  test("audioFingerprint: gain-invariant, signal-separating, junk dropped") {
    import SparkTestSession.spark.implicits._
    def clip(p: Int, g: Int): Array[Byte] =
      MediaCodecs.writeWavPcm16(8000, Array.tabulate(825) { i =>
        ((((i.toLong * i * 7 + i * 13 + p * 307) % 16001L) - 8000L) * g).toShort
      })
    val rows = Seq(
      Multimodal.MediaRow(0L, "wav", clip(0, 1)),
      Multimodal.MediaRow(1L, "wav", clip(0, 2)), // ×2 gain re-master
      Multimodal.MediaRow(2L, "wav", clip(3, 1)), // different signal
      Multimodal.MediaRow(3L, "wav", Array.fill[Byte](40)(9)))
    val out = Multimodal.audioFingerprint(
      SparkTestSession.spark.createDataset(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L) == out(1L), "uniform gain must not change the fingerprint")
    assert(out(0L) != out(2L), "different signals must separate")
    // short clip: hashes only its available frames, never throws
    val short = Multimodal.audioFingerprint(SparkTestSession.spark
      .createDataset(Seq(Multimodal.MediaRow(9L, "wav",
        MediaCodecs.writeWavPcm16(8000, Array.fill[Short](30)(100))))))
      .collect()
    assert(short.length == 1)
  }

  test("videoDHash: per-frame hashes, palette-shift invariant, junk dropped") {
    import SparkTestSession.spark.implicits._
    def gif(p: Int, shift: Int): Array[Byte] = {
      val palette = Array.tabulate(16) { c =>
        val r = (c * 37 + p * 11) % 200 + shift
        val g = (c * 53 + p * 7) % 200 + shift
        val b = (c * 29 + p * 3) % 200 + shift
        (r << 16) | (g << 8) | b
      }
      val frames = (0 until 2).map(f => Array.tabulate(16 * 12) { i =>
        ((i % 16 * 5 + i / 16 * 3 + f * 7 + p * 2) % 16).toByte
      })
      GifCodec.writeGifAnimated(16, 12, palette, frames, 4)
    }
    val rows = Seq(
      Multimodal.MediaRow(0L, "gif", gif(0, 0)),
      Multimodal.MediaRow(1L, "gif", gif(0, 10)), // +10 palette brightness
      Multimodal.MediaRow(2L, "gif", gif(3, 0)),  // different scene
      Multimodal.MediaRow(3L, "gif", Array.fill[Byte](25)(4)))
    val out = Multimodal.videoDHash(
      SparkTestSession.spark.createDataset(rows))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L).length == 2, "one hash per frame")
    assert(out(0L) == out(1L), "palette brightness shift must not change hashes")
    assert(out(0L) != out(2L), "different scenes must separate")
  }

  test("PNG RGB round-trip recovers dims and exact pixels under ALL filters") {
    // one row per filter type (0..4): a decode mismatch pins the exact
    // unfilter path that broke
    val w = 13; val h = 10 // w*3 not divisible by 4: no accidental stride luck
    def px(x: Int, y: Int) = ((x * 17 + y * 3) % 256, (255 - x * 5) % 256, (x * y) % 256)
    val png = MediaCodecs.writePngRgb(w, h, px, filterOfRow = y => y % 5)
    val info = MediaCodecs.parsePng(png)
    assert(info.isDefined, "decode failed")
    assert(info.get.width == w && info.get.height == h)
    assert(info.get.bitDepth == 8 && info.get.colorType == 2)
    // mean luminance must equal the direct computation over the source
    // pixels — proves unfiltering recovered every byte, not just the header
    val exact = (for { y <- 0 until h; x <- 0 until w } yield {
      val (r, g, b) = px(x, y); 0.299 * r + 0.587 * g + 0.114 * b
    }).sum / (w * h)
    assert(math.abs(info.get.meanLuminance - exact) < 1e-9,
      s"luminance drift: ${info.get.meanLuminance} vs $exact")
  }

  test("PNG randomized round-trip fuzz: any dims, any filter mix, exact pixels") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 20).foreach { trial =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val seed = rnd.nextInt(1 << 20)
      def px(x: Int, y: Int) = {
        val v = x * 31 + y * 131 + seed
        (v % 256, (v * 7) % 256, (v * 13) % 256)
      }
      val filters = Array.fill(h)(rnd.nextInt(5))
      val png = MediaCodecs.writePngRgb(w, h, px, filterOfRow = filters)
      val info = MediaCodecs.parsePng(png)
      assert(info.isDefined, s"trial $trial ($w x $h) failed to decode")
      assert(info.get.width == w && info.get.height == h, s"trial $trial dims")
      val exact = (for { y <- 0 until h; x <- 0 until w } yield {
        val (r, g, b) = px(x, y); 0.299 * r + 0.587 * g + 0.114 * b
      }).sum / (w * h)
      assert(math.abs(info.get.meanLuminance - exact) < 1e-9,
        s"trial $trial ($w x $h, filters ${filters.mkString(",")}): " +
          s"${info.get.meanLuminance} vs $exact")
    }
  }

  test("PNG parser rejects junk, truncation, and unsupported layouts") {
    assert(MediaCodecs.parsePng(Array.fill[Byte](100)(7)).isEmpty)
    val good = MediaCodecs.writePngRgb(5, 4, (x, y) => (x, y, 0))
    assert(MediaCodecs.parsePng(good).isDefined)
    // truncated IDAT: zlib stream cut mid-way must return None, not throw
    assert(MediaCodecs.parsePng(good.take(good.length - 20)).isEmpty)
    // corrupt chunk length (negative) must not hang the chunk walk
    val corrupt = good.clone(); corrupt(8) = 0xff.toByte
    assert(MediaCodecs.parsePng(corrupt).isEmpty)
    // interlaced flag set → unsupported layout, clean None
    val inter = good.clone(); inter(8 + 20) = 1
    assert(MediaCodecs.parsePng(inter).isEmpty)
    // zlib FDICT flag (preset dictionary): inflate() yields 0 with
    // needsInput=false forever — must return None, not spin the task
    val fdict = good.clone()
    fdict(8 + 25 + 8) = 0x78.toByte; fdict(8 + 25 + 9) = 0xbb.toByte
    assert(MediaCodecs.parsePng(fdict).isEmpty)
    // implausible IHDR dims vs actual IDAT bytes: reject BEFORE the
    // gigabyte allocation, not at OOM
    val huge = good.clone()
    // height field (bytes 20..23, big-endian) := 2^27
    huge(20) = 0x08.toByte; huge(21) = 0; huge(22) = 0; huge(23) = 0
    val t0 = System.nanoTime()
    assert(MediaCodecs.parsePng(huge).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 1.0, "rejection was not cheap")
  }

  test("extractMeta dispatches real codecs by kind, stub otherwise") {
    import spark.implicits._
    val wav = MediaCodecs.writeWavPcm16(22050, Array.fill[Short](100)(0))
    val bmp = MediaCodecs.writeBmp24(7, 5, (_, _) => (1, 2, 3))
    val rows = Seq(
      Multimodal.MediaRow(1L, "wav", wav),
      Multimodal.MediaRow(2L, "bmp", bmp),
      Multimodal.MediaRow(3L, "jpeg", Array.tabulate(64)(_.toByte)), // stub
      Multimodal.MediaRow(4L, "wav", Array.fill[Byte](20)(3)))      // bad wav → stub
    val meta = Multimodal.extractMeta(rows.toDS()).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(1L).sample_rate == 22050 && meta(1L).width == 0)
    assert(meta(2L).width == 7 && meta(2L).height == 5 && meta(2L).sample_rate == 0)
    assert(meta(3L).checksum != 0) // stub path still yields deterministic meta
    assert(meta(4L).n_bytes == 20) // unparseable falls back, row kept
  }

  test("audio/image feature extraction runs distributed and drops junk rows") {
    import spark.implicits._
    val rows = (0L until 8L).map { i =>
      Multimodal.MediaRow(i, "wav",
        MediaCodecs.writeWavPcm16(8000 + i.toInt * 500,
          Array.tabulate(200 + i.toInt)(j => ((j % 32) * 512).toShort)))
    } :+ Multimodal.MediaRow(99L, "wav", Array.fill[Byte](5)(1))
    val feats = Multimodal.audioFeatures(rows.toDS().repartition(4)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats.size == 8 && !feats.contains(99L))
    assert(feats(3L).getInt(2) == 9500 && feats(3L).getInt(3) == 203)

    val imgs = Seq(Multimodal.MediaRow(1L, "bmp",
      MediaCodecs.writeBmp24(6, 4, (x, y) => (x, y, 0))))
    val ifeats = Multimodal.imageFeatures(imgs.toDS()).collect()
    assert(ifeats.length == 1 && ifeats.head.getInt(1) == 6)
  }

  test("JPEG shell round-trip: SOF scan recovers dims; shell size closed-form") {
    val b = MediaCodecs.writeJpegShell(1023, 511)
    assert(b.length == 41) // the oracle's closed-form constant
    val i = MediaCodecs.parseJpegMeta(b).get
    assert(i.width == 1023 && i.height == 511 && i.nComponents == 3)
    // SOF after padding/unknown APPn segments still found (real-file shape)
    val appn = Array[Byte](0xff.toByte, 0xe1.toByte, 0, 6, 1, 2, 3, 4)
    val padded = b.slice(0, 2) ++ appn ++ b.drop(2)
    assert(MediaCodecs.parseJpegMeta(padded).get.width == 1023)
  }

  test("JPEG parser rejects non-JPEG, truncation, and SOS-before-SOF") {
    assert(MediaCodecs.parseJpegMeta(Array.fill[Byte](20)(3)).isEmpty)
    assert(MediaCodecs.parseJpegMeta(Array.emptyByteArray).isEmpty)
    val b = MediaCodecs.writeJpegShell(100, 100)
    assert(MediaCodecs.parseJpegMeta(b.slice(0, 10)).isEmpty) // cut mid-APP0
    // SOS marker before any SOF → no frame header to report
    val sos = Array[Byte](0xff.toByte, 0xda.toByte, 0, 2)
    assert(MediaCodecs.parseJpegMeta(b.slice(0, 2) ++ sos).isEmpty)
    // a segment whose declared length walks past the end must not loop
    val evil = b.clone()
    evil(4) = 0x7f; evil(5) = -1 // APP0 len = 32767 > payload
    assert(MediaCodecs.parseJpegMeta(evil).isEmpty)
  }

  test("MP4 shell round-trip: box walk recovers dims/timescale/duration") {
    val b = MediaCodecs.writeMp4Shell(1920, 1080, 90000, 123456789L)
    assert(b.length == 236) // the oracle's closed-form constant
    val i = MediaCodecs.parseMp4Meta(b).get
    assert(i.width == 1920 && i.height == 1080)
    assert(i.timescale == 90000 && i.durationTicks == 123456789L)
  }

  test("imageFeatures decodes JPEG pixels for real (mean luminance)") {
    import spark.implicits._
    val bytes = JpegCodec.writeJpegBaseline(24, 16, (_, _) => (200, 80, 40))
    val rows = Seq(Multimodal.MediaRow(5L, "jpeg", bytes)).toDS()
    val f = Multimodal.imageFeatures(rows).collect().head
    assert(f.getInt(1) == 24 && f.getInt(2) == 16)
    // flat (200,80,40) has luminance 111.32; quantization error <= ~4
    assert(math.abs(f.getDouble(4) - 111.32) <= 5.0,
      s"mean luminance ${f.getDouble(4)}")
  }

  test("imageFeatures and extractMeta handle GIF (exact palette luminance)") {
    import spark.implicits._
    // single-color palette image: luminance is exact (GIF is lossless)
    val pal = Array(0x000000, 0xc85028) // (200, 80, 40)
    val idx = Array.fill[Byte](18 * 7)(1)
    val bytes = GifCodec.writeGif(18, 7, pal, idx)
    val rows = Seq(Multimodal.MediaRow(6L, "gif", bytes)).toDS()
    val f = Multimodal.imageFeatures(rows).collect().head
    assert(f.getInt(1) == 18 && f.getInt(2) == 7)
    assert(f.getInt(3) == 8) // palette-indexed bpp
    assert(math.abs(f.getDouble(4) - 111.32) < 1e-9,
      s"mean luminance ${f.getDouble(4)}")
    val m = Multimodal.extractMeta(rows.map(r =>
      Multimodal.MediaRow(r.media_id, "gif", r.bytes))).collect().head
    assert(m.width == 18 && m.height == 7)
  }

  test("MP4 codec fourcc: stsd chain recovered; absent chain is None") {
    val withCodec = MediaCodecs.writeMp4ShellWithCodec(
      1280, 720, 30000, 4242L, "avc1")
    assert(MediaCodecs.parseMp4Codec(withCodec).contains("avc1"))
    // the spliced shell still parses as ordinary metadata
    val meta = MediaCodecs.parseMp4Meta(withCodec).get
    assert(meta.width == 1280 && meta.height == 720 && meta.timescale == 30000)
    // audio fourcc too
    assert(MediaCodecs.parseMp4Codec(MediaCodecs.writeMp4ShellWithCodec(
      0, 0, 44100, 1000L, "mp4a")).contains("mp4a"))
    // the minimal shell has no mdia chain -> None, not a throw
    assert(MediaCodecs.parseMp4Codec(
      MediaCodecs.writeMp4Shell(64, 64, 1000, 10L)).isEmpty)
    // truncation anywhere never throws
    for (n <- 0 until withCodec.length by 3)
      MediaCodecs.parseMp4Codec(withCodec.take(n))
  }

  test("MP4 parser rejects non-BMFF and malformed box sizes") {
    assert(MediaCodecs.parseMp4Meta(Array.fill[Byte](50)(9)).isEmpty)
    assert(MediaCodecs.parseMp4Meta(Array.emptyByteArray).isEmpty)
    val b = MediaCodecs.writeMp4Shell(64, 64, 1000, 10L)
    assert(MediaCodecs.parseMp4Meta(b.slice(0, 30)).isEmpty) // moov truncated
    // box size 0 ("to end of file") and size < 8 are rejected, not looped on
    val evil = b.clone()
    evil(20) = 0; evil(21) = 0; evil(22) = 0; evil(23) = 0 // moov size = 0
    assert(MediaCodecs.parseMp4Meta(evil).isEmpty)
  }

  test("MJPEG mp4: sample walk returns the exact frame bytes written") {
    val frames = Seq(
      JpegCodec.writeJpegBaseline(24, 16, (x, y) => (x * 10, y * 12, x + y)),
      JpegCodec.writeJpegBaseline(24, 16, (x, y) => (y * 7, x * 3, 2 * x)),
      JpegCodec.writeJpegBaseline(24, 16, (x, y) => (x, y, x * y % 256)))
    val mp4 = MediaCodecs.writeMp4Mjpeg(24, 16, 1000, 40, frames)
    assert(MediaCodecs.parseMp4Codec(mp4).contains("jpeg"))
    val meta = MediaCodecs.parseMp4Meta(mp4).get
    assert(meta.width == 24 && meta.height == 16 &&
      meta.durationTicks == 120) // 3 frames x 40 ticks
    val samples = MediaCodecs.readMp4Samples(mp4).get
    assert(samples.size == 3)
    samples.zip(frames).foreach { case (got, want) =>
      assert(got.toSeq == want.toSeq, "sample bytes must round-trip exactly")
    }
    // and every extracted sample decodes as a standalone baseline JPEG
    samples.foreach { s =>
      val img = JpegCodec.decodeJpeg(s)
      assert(img.isDefined && img.get.width == 24 && img.get.height == 16)
    }
  }

  test("videoFrameFeatures decodes MJPEG samples; foreign codecs pass through") {
    import spark.implicits._
    val mjpeg = MediaCodecs.writeMp4Mjpeg(16, 16, 1000, 40, Seq(
      JpegCodec.writeJpegBaseline(16, 16, (_, _) => (200, 100, 50)),
      JpegCodec.writeJpegBaseline(16, 16, (_, _) => (200, 100, 50))))
    val avc = MediaCodecs.writeMp4ShellWithCodec(320, 200, 1000, 500, "avc1")
    val rows = Multimodal.videoFrameFeatures(Seq(
      Multimodal.MediaRow(1L, "mp4", mjpeg),
      Multimodal.MediaRow(2L, "mp4", avc)).toDS())
      .collect().map(r => r.getLong(0) -> r).toMap
    val m = rows(1L)
    assert(m.getString(1) == "jpeg" && m.getInt(2) == 2 && m.getInt(3) == 2)
    assert(m.getInt(4) == 16 && m.getInt(5) == 16)
    // flat color: decoded luma within JPEG quantization error of the source
    val srcLuma = 0.299 * 200 + 0.587 * 100 + 0.114 * 50
    assert(math.abs(m.getDouble(6) - srcLuma) <= 4.0, s"luma ${m.getDouble(6)}")
    // avc1: indexed by fourcc, zero decoded frames, tkhd display dims
    val a = rows(2L)
    assert(a.getString(1) == "avc1" && a.getInt(3) == 0 &&
      a.getInt(4) == 320 && a.getInt(5) == 200)
  }

  test("fuzz: MJPEG mp4 truncation and byte corruption never throw") {
    val mp4 = MediaCodecs.writeMp4Mjpeg(16, 16, 1000, 40, Seq(
      JpegCodec.writeJpegBaseline(16, 16, (x, y) => (x * 9, y * 11, x + y))))
    for (len <- 0 until mp4.length by 5)
      MediaCodecs.readMp4Samples(java.util.Arrays.copyOf(mp4, len))
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val c = mp4.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      MediaCodecs.readMp4Samples(c).foreach(_.foreach(JpegCodec.decodeJpeg))
    }
  }

  test("jpeg/mp4 parsers survive seeded byte fuzz: no throw, no hang") {
    // executor-side parsers see arbitrary bytes; None is fine, an exception
    // or an unbounded marker/box walk is not. Seeded loop (scalacheck is
    // not in the offline cache): random garbage + bit-flipped valid shells.
    val rnd = new scala.util.Random(4242)
    (1 to 300).foreach { _ =>
      val garbage = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt().toByte)
      MediaCodecs.parseJpegMeta(garbage)
      MediaCodecs.parseMp4Meta(garbage)
    }
    val jb = MediaCodecs.writeJpegShell(640, 480)
    val mb = MediaCodecs.writeMp4Shell(640, 480, 1000, 500L)
    (1 to 300).foreach { _ =>
      val j = jb.clone(); j(rnd.nextInt(j.length)) = rnd.nextInt().toByte
      val m = mb.clone(); m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      MediaCodecs.parseJpegMeta(j) // Option either way — must just return
      MediaCodecs.parseMp4Meta(m)
    }
    // truncations at every length
    (0 until jb.length).foreach(n => MediaCodecs.parseJpegMeta(jb.take(n)))
    (0 until mb.length).foreach(n => MediaCodecs.parseMp4Meta(mb.take(n)))
  }

  test("extractMeta dispatches jpeg/mp4 through the real header parsers") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "jpeg", MediaCodecs.writeJpegShell(320, 200)),
      Multimodal.MediaRow(2L, "mp4", MediaCodecs.writeMp4Shell(640, 480, 600, 6000L)))
    val meta = Multimodal.extractMeta(rows.toDS()).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(1L).width == 320 && meta(1L).height == 200 && meta(1L).sample_rate == 0)
    assert(meta(2L).width == 640 && meta(2L).height == 480 && meta(2L).sample_rate == 600)
  }
}
