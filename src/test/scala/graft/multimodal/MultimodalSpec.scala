package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String)*) =
    Multimodal.asMediaTable(rows.toSeq.toDF("id", "text"), "id", "text")

  test("windowFeatures: windows tile the payload exactly") {
    val text = "a" * 300 // 3 windows of 128: 128 + 128 + 44
    val rows = Multimodal.windowFeatures(media(1L -> text), windowSize = 128)
      .orderBy("win_no")
      .select("win_no", "n_samples", "energy", "peak")
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.map(_._2).toSeq == Seq(128, 128, 44))
    assert(rows.map(_._2.toLong).sum == text.length)
    // 'a' = 97: energy is exactly 97·n, peak 97 everywhere
    rows.foreach { case (_, n, e, p) => assert(e == 97L * n && p == 97L) }
  }

  test("windowFeatures: per-window energy/peak match a direct computation") {
    val text = "The quick brown fox jumps over the lazy dog" * 4 // 172 chars
    val rows = Multimodal.windowFeatures(media(7L -> text), windowSize = 64)
      .orderBy("win_no")
      .select("n_samples", "energy", "peak").as[(Int, Long, Long)].collect()
    val expected = text.grouped(64).toSeq.map(w =>
      (w.length, w.map(_.toLong).sum, w.map(_.toLong).max))
    assert(rows.toSeq == expected)
  }

  test("windowFeatures: empty payload yields one zero window") {
    val rows = Multimodal.windowFeatures(media(9L -> ""), windowSize = 128)
      .select("win_no", "n_samples", "energy", "peak")
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.toSeq == Seq((0L, 0, 0L, 0L)))
  }

  test("WAV decode: 16-bit round trip is sample-exact incl. negative and edge values") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = Multimodal.encodeWavPcm16(44100, 2, samples)
    val got = Multimodal.decodeWav(wav)
    assert(got.sampleRate == 44100 && got.channels == 2 && got.bitsPerSample == 16)
    assert(got.samples.toSeq == samples.map(_.toInt).toSeq)
  }

  test("WAV decode: unknown chunks are skipped, odd sizes word-aligned, 8-bit unsigned normalized") {
    // hand-packed file: RIFF [LIST(5 bytes + pad)] [fmt 8-bit] [data 3 bytes]
    val bb = java.nio.ByteBuffer.allocate(128).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String) = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(0); cc("WAVE") // riff size field untrusted by parser
    cc("LIST"); bb.putInt(5); bb.put(Array[Byte](1, 2, 3, 4, 5)); bb.put(0.toByte) // odd size + pad
    cc("fmt "); bb.putInt(16); bb.putShort(1); bb.putShort(1); bb.putInt(8000)
    bb.putInt(8000); bb.putShort(1); bb.putShort(8)
    cc("data"); bb.putInt(3); bb.put(Array[Byte](0, 128.toByte, 255.toByte))
    val bytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    val got = Multimodal.decodeWav(bytes)
    assert(got.sampleRate == 8000 && got.channels == 1 && got.bitsPerSample == 8)
    // 8-bit WAV is unsigned 0..255, normalized to signed: 0→-128, 128→0, 255→127
    assert(got.samples.toSeq == Seq(-128, 0, 127))
  }

  test("WAV decode: odd-sized unpadded chunk at EOF fails with the decoder's message") {
    // files in the wild end with odd-sized tag chunks (LIST/INFO) omitting
    // the RIFF-mandated pad byte; the chunk-skip clamps to the buffer so a
    // dataless file dies on the decoder's descriptive require, not a bare
    // ByteBuffer position exception
    val bb = java.nio.ByteBuffer.allocate(128).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String) = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(0); cc("WAVE")
    cc("fmt "); bb.putInt(16); bb.putShort(1); bb.putShort(1); bb.putInt(8000)
    bb.putInt(8000); bb.putShort(1); bb.putShort(8)
    cc("LIST"); bb.putInt(3); bb.put(Array[Byte](7, 8, 9)) // odd, NO pad, at EOF
    val bytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    val err = intercept[IllegalArgumentException] { Multimodal.decodeWav(bytes) }
    assert(Option(err.getMessage).exists(_.contains("missing data chunk")),
      s"want the decoder's own diagnostic, got: ${err.getMessage}")
  }

  test("WAV decode: non-RIFF and non-PCM payloads fail loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("not a wav file at all".getBytes("US-ASCII"))
    }
    // float-format WAV (format tag 3) must be rejected, not misread
    val wav = Multimodal.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))
    wav(20) = 3 // audioFormat lives at offset 20 in the canonical layout
    intercept[IllegalArgumentException] { Multimodal.decodeWav(wav) }
  }

  test("wavFeatures: distributed decode emits exact integer stats") {
    val rows = Seq(1L, 2L).map { id =>
      val samples = Array.tabulate(10)(i => (i * 1000 * (if (i % 2 == 0) 1 else -1)).toShort)
      (id, "audio", Multimodal.encodeWavPcm16(16000, 1, samples), 64L)
    }.toDF("media_id", "modality", "bytes", "byte_len")
    val got = Multimodal.wavFeatures(rows)
      .select("media_id", "sample_rate", "n_samples", "energy", "peak")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    val energy = (0 until 10).map(i => math.abs(i * 1000L)).sum
    assert(got == Set((1L, 16000, 10L, energy, 9000L), (2L, 16000, 10L, energy, 9000L)))
  }

  // ── PNG: real decode (round 11) ──────────────────────────────────────────

  private def px(w: Int, h: Int, c: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h * c)(i => ((seed * 31 + i * 97) % 256).toInt)

  test("PNG: round trip is pixel-exact for gray/gray+alpha/RGB/RGBA across all 5 filters") {
    for (c <- 1 to 4) {
      val (w, h) = (11, 7) // height ≥ 5 → encoder uses every filter type
      val pixels = px(w, h, c, seed = 40 + c)
      val img = Multimodal.decodePng(Multimodal.encodePng(w, h, c, pixels))
      assert(img.width == w && img.height == h && img.channels == c)
      assert(img.pixels.toSeq == pixels.toSeq, s"channels=$c")
    }
  }

  test("PNG: zlib stream spanning multiple IDAT chunks decodes (incompressible payload)") {
    // pseudo-random pixels don't compress below the 1024-byte IDAT split
    val rnd = new scala.util.Random(42)
    val (w, h, c) = (40, 30, 3)
    val pixels = Array.fill(w * h * c)(rnd.nextInt(256))
    val bytes = Multimodal.encodePng(w, h, c, pixels)
    // count IDAT chunks to prove the multi-chunk path is actually exercised
    def countIdat(b: Array[Byte]): Int = {
      val buf = java.nio.ByteBuffer.wrap(b).position(8)
      var n = 0
      while (buf.remaining() >= 12) {
        val len = buf.getInt
        val typ = new Array[Byte](4); buf.get(typ)
        if (new String(typ, "US-ASCII") == "IDAT") n += 1
        buf.position(buf.position() + len + 4)
      }
      n
    }
    assert(countIdat(bytes) > 1, "fixture must split IDAT")
    assert(Multimodal.decodePng(bytes).pixels.toSeq == pixels.toSeq)
  }

  test("PNG: corrupted chunk CRC, bad signature, and palette color type fail loudly") {
    val good = Multimodal.encodePng(4, 4, 1, px(4, 4, 1, 3))
    val corrupt = good.clone()
    corrupt(20) = (corrupt(20) ^ 0x1).toByte // inside IHDR data → CRC mismatch
    val e1 = intercept[IllegalArgumentException] { Multimodal.decodePng(corrupt) }
    assert(Option(e1.getMessage).exists(_.contains("CRC")))
    intercept[IllegalArgumentException] {
      Multimodal.decodePng("definitely not a png".getBytes("US-ASCII"))
    }
    // rewrite IHDR with color type 3 (palette) and a fixed-up CRC: must be
    // rejected as unsupported, not misdecoded
    val pal = good.clone()
    pal(8 + 8 + 9) = 3 // colorType byte inside IHDR data
    val crc = new java.util.zip.CRC32()
    crc.update(pal, 8 + 4, 4 + 13)
    java.nio.ByteBuffer.wrap(pal).putInt(8 + 8 + 13, crc.getValue.toInt)
    val e2 = intercept[IllegalArgumentException] { Multimodal.decodePng(pal) }
    assert(Option(e2.getMessage).exists(_.contains("color type")))
  }

  test("PNG: conformance against javax.imageio as an independent peer, both directions") {
    // our writer → ImageIO reader
    val (w, h) = (9, 6)
    val rgb = px(w, h, 3, seed = 77)
    val viaImageIo = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodePng(w, h, 3, rgb)))
    assert(viaImageIo.getWidth == w && viaImageIo.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = viaImageIo.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff) ==
        ((rgb(base), rgb(base + 1), rgb(base + 2))), s"($x,$y)")
    }
    // ImageIO writer → our reader
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      bi.setRGB(x, y, (rgb(base) << 16) | (rgb(base + 1) << 8) | rgb(base + 2))
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", out))
    val img = Multimodal.decodePng(out.toByteArray)
    assert(img.width == w && img.height == h && img.channels == 3)
    assert(img.pixels.toSeq == rgb.toSeq)
  }

  // ── ImageIO-backed decode (round 11): JPEG/BMP/GIF via JDK codecs ───────

  test("BMP: closed-form encodeBmp24 bytes decode pixel-exact under ImageIO, incl. row padding") {
    for (w <- Seq(4, 5, 6, 7)) { // rowBytes % 4 = 0,3,2,1 — every pad width
      val h = 5
      val pixels = px(w, h, 3, seed = 50 + w)
      val img = Multimodal.decodeImage(Multimodal.encodeBmp24(w, h, pixels))
      assert(img.width == w && img.height == h && img.channels == 3)
      assert(img.pixels.toSeq == pixels.toSeq, s"w=$w")
    }
  }

  test("JPEG: JDK codec round trip — dims exact, smooth gradient recovered within lossy tolerance") {
    val (w, h) = (32, 24)
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | 128)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", out))
    val img = Multimodal.decodeImage(out.toByteArray)
    assert(img.width == w && img.height == h && img.channels == 3)
    val mae = (0 until h).flatMap { y => (0 until w).flatMap { x =>
      val base = (y * w + x) * 3
      Seq(math.abs(img.pixels(base) - x * 8),
        math.abs(img.pixels(base + 1) - y * 10),
        math.abs(img.pixels(base + 2) - 128))
    }}.sum.toDouble / (w * h * 3)
    assert(mae < 8.0, s"JPEG mean abs error $mae too high for a smooth gradient")
  }

  test("decodeImage: dispatches our PNG bytes too, and fails loudly on garbage") {
    val pixels = px(6, 5, 3, seed = 9)
    val img = Multimodal.decodeImage(Multimodal.encodePng(6, 5, 3, pixels))
    assert(img.pixels.toSeq == pixels.toSeq)
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeImage("not an image of any kind".getBytes("US-ASCII"))
    }
    assert(Option(e.getMessage).exists(_.contains("no ImageIO reader")))
  }

  test("imageFeatures: distributed ImageIO decode emits exact integer stats over BMP payloads") {
    val rows = Seq(1L, 2L).map { id =>
      val pixels = px(6, 4, 3, seed = id)
      val bmp = Multimodal.encodeBmp24(6, 4, pixels)
      (id, "image", bmp, bmp.length.toLong)
    }.toDF("media_id", "modality", "bytes", "byte_len")
    val got = Multimodal.imageFeatures(rows)
      .select("media_id", "width", "height", "n_px", "px_sum", "px_wsum")
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSet
    val want = Seq(1L, 2L).map { id =>
      val p = px(6, 4, 3, seed = id)
      (id, 6, 4, p.length.toLong, p.map(_.toLong).sum,
        p.zipWithIndex.map { case (v, i) => v.toLong * (i + 1) }.sum)
    }.toSet
    assert(got == want)
  }

  // ── AVI: real video demux + frame decode (round 11) ─────────────────────

  test("AVI: DIB profile round trip — every frame pixel-exact, dims and fps recovered") {
    val (w, h) = (7, 5) // rowBytes = 21 → 3 pad bytes per row
    val frames = (0 until 4).map(f => px(w, h, 3, seed = 60 + f))
    val v = Multimodal.decodeAvi(Multimodal.encodeAviDib(w, h, 12, frames))
    assert(v.width == w && v.height == h && v.fps == 12.0)
    assert(v.frames.length == 4)
    frames.zip(v.frames).foreach { case (want, got) =>
      assert(got.channels == 3 && got.pixels.toSeq == want.toSeq)
    }
  }

  test("AVI: MJPEG profile — '00dc' JPEG frames decode via ImageIO within lossy tolerance") {
    val (w, h) = (32, 16)
    val jpegs = (0 until 3).map { f =>
      val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, ((x * 8) << 16) | ((y * 15) << 8) | (f * 60))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "jpg", out))
      out.toByteArray
    }
    val v = Multimodal.decodeAvi(Multimodal.encodeAviMjpeg(w, h, 25, jpegs))
    assert(v.width == w && v.height == h && v.fps == 25.0 && v.frames.length == 3)
    v.frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.width == w && img.height == h)
      val mae = (0 until h).flatMap { y => (0 until w).flatMap { x =>
        val base = (y * w + x) * 3
        Seq(math.abs(img.pixels(base) - x * 8),
          math.abs(img.pixels(base + 1) - y * 15),
          math.abs(img.pixels(base + 2) - f * 60))
      }}.sum.toDouble / (w * h * 3)
      assert(mae < 8.0, s"frame $f MAE $mae")
    }
  }

  test("PNG: adversarial headers and streams fail loudly, never hang or misdecode") {
    // forge a PNG: signature + caller-built chunks with valid CRCs
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len); out.write(typ.getBytes("US-ASCII")); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      out.toByteArray
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def ihdr(w: Int, h: Int, colorType: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
    def png(parts: Array[Byte]*): Array[Byte] =
      (sig +: parts).reduce(_ ++ _)
    // (1) declared dimensions whose stride arithmetic would overflow Int:
    // rejected on the decode budget BEFORE any allocation
    val huge = png(chunk("IHDR", ihdr(1 << 13, 1 << 13, 6)),
      chunk("IDAT", Array[Byte](0x78, 0x01)), chunk("IEND", Array.empty))
    val e1 = intercept[IllegalArgumentException] { Multimodal.decodePng(huge) }
    assert(Option(e1.getMessage).exists(_.contains("decode budget")), e1.getMessage)
    // (2) zlib stream with FDICT set: inflate() returns 0 forever with
    // needsInput()==false — must fail loudly instead of spinning
    // (0x78,0xBB: FDICT bit set, header checksum valid: 0x78BB % 31 == 0)
    val fdict = png(chunk("IHDR", ihdr(2, 2, 0)),
      chunk("IDAT", Array[Byte](0x78.toByte, 0xBB.toByte, 1, 2, 3, 4, 5, 6)),
      chunk("IEND", Array.empty))
    val e2 = intercept[IllegalArgumentException] { Multimodal.decodePng(fdict) }
    assert(Option(e2.getMessage).exists(_.contains("dictionary")), e2.getMessage)
  }

  test("AVI: truncated avih/strh declared sizes are rejected, not read past") {
    def cc(bb: java.nio.ByteBuffer, s: String): Unit =
      bb.put(s.getBytes("US-ASCII"))
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    cc(bb, "RIFF"); bb.putInt(56); cc(bb, "AVI ")
    cc(bb, "avih"); bb.putInt(8) // declared 8 bytes — the parser reads 40
    bb.putInt(1); bb.putInt(2)
    val bytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    val e = intercept[IllegalArgumentException] { Multimodal.decodeAvi(bytes) }
    assert(Option(e.getMessage).exists(_.contains("avih chunk too short")), e.getMessage)
  }

  test("AVI: non-AVI payloads fail loudly, WAV is not misread as video") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeAvi("definitely not an avi".getBytes("US-ASCII"))
    }
    val wav = Multimodal.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))
    val e = intercept[IllegalArgumentException] { Multimodal.decodeAvi(wav) }
    assert(Option(e.getMessage).exists(_.contains("not AVI")))
  }

  test("videoFrameFeatures: distributed demux samples every k-th frame with exact stats") {
    val (w, h) = (6, 4)
    val mkFrames = (id: Long) => (0 until 5).map(f => px(w, h, 3, seed = id * 10 + f))
    val rows = Seq(1L, 2L).map { id =>
      val avi = Multimodal.encodeAviDib(w, h, 10, mkFrames(id))
      (id, "video", avi, avi.length.toLong)
    }.toDF("media_id", "modality", "bytes", "byte_len")
    val got = Multimodal.videoFrameFeatures(rows, everyK = 2)
      .select("media_id", "frame_no", "n_px", "px_sum", "px_wsum")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = (for { id <- Seq(1L, 2L); f <- Seq(0, 2, 4) } yield {
      val p = mkFrames(id)(f)
      (id, f.toLong, p.length.toLong, p.map(_.toLong).sum,
        p.zipWithIndex.map { case (v, i) => v.toLong * (i + 1) }.sum)
    }).toSet
    assert(got == want)
  }

  test("pngFeatures: distributed decode emits exact integer stats") {
    val rows = Seq(1L, 2L).map { id =>
      val c = 1 + (id % 4).toInt
      val pixels = px(5, 5, c, seed = id)
      (id, "image", Multimodal.encodePng(5, 5, c, pixels), 0L)
    }.toDF("media_id", "modality", "bytes", "byte_len")
    val got = Multimodal.pngFeatures(rows)
      .select("media_id", "width", "height", "channels", "n_px", "px_sum", "px_max", "px_wsum")
      .as[(Long, Int, Int, Int, Long, Long, Long, Long)].collect().toSet
    val want = Seq(1L, 2L).map { id =>
      val c = 1 + (id % 4).toInt
      val p = px(5, 5, c, seed = id)
      (id, 5, 5, c, p.length.toLong, p.map(_.toLong).sum, p.map(_.toLong).max,
        p.zipWithIndex.map { case (v, i) => v.toLong * (i + 1) }.sum)
    }.toSet
    assert(got == want)
  }
}
