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
}
