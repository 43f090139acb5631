package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder-prompt extension).
  *
  * Design: media are opaque `BINARY` columns with a typed metadata struct
  * alongside — the 100 TB pattern is parquet rows of (id, modality, bytes,
  * meta), partitioned by modality/date, with decode and feature extraction
  * running per-partition so one executor batches many blobs through one
  * decoder instance (`mapPartitions`, the JVM analogue of `mapInPandas`).
  *
  * Audio is decoded for REAL: [[decodeWav]] is a full WAV/RIFF PCM parser
  * (pure byte layout, no native codec needed) with [[wavFeatures]] as its
  * mapPartitions operator, oracle-proved round-trip (mm_wav_decode).
  * Compressed image/video codecs are NOT in this container, so
  * [[decodeStub]] remains a clearly-marked deterministic fake for those
  * modalities; the Spark-side plumbing — schema, batch shape,
  * per-partition execution, metadata extraction — is real and tested.
  * Swap `decodeStub` for a JNI/ONNX decoder per executor in production.
  */
object Multimodal {

  /** A media row: binary payload + typed metadata. */
  final case class MediaRow(media_id: Long, modality: String, bytes: Array[Byte],
                            byte_len: Long)

  /** Extracted features: fixed-width deterministic vector per blob. */
  final case class MediaFeatures(media_id: Long, modality: String,
                                 byte_len: Long, features: Array[Float])

  /** Wrap a text table as a media table (payload = UTF-8 bytes) — the test
    * stand-in for real blobs; keeps schema/partitioning honest.
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String,
                   modality: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      encode(col(textCol), "UTF-8").as("bytes"),
      length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"))

  /** STUB decoder: a real pipeline would decode image/audio bytes here
    * (libjpeg/ffmpeg per executor). Deterministic fake: 4 features derived
    * from a polynomial hash of the payload — enough to test partitioning,
    * batch shape and schema end-to-end.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    Array((h % 1000L).toFloat, ((h / 1000L) % 1000L).toFloat,
      ((h / 1000000L) % 1000L).toFloat, bytes.length.toFloat)
  }

  /** Per-partition feature extraction: one "decoder" per partition, blobs
    * streamed through in batch — the mapPartitions shape that amortizes
    * model/codec init at scale (SURVEY §2.9 M1/M7 pattern).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "bytes", "byte_len").as[MediaRow]
      .mapPartitions { rows =>
        // decoder init would happen HERE, once per partition
        rows.map(r => MediaFeatures(r.media_id, r.modality, r.byte_len,
          decodeStub(r.bytes)))
      }
  }

  // ── Real audio decode: WAV/RIFF PCM (round 10) ─────────────────────────
  // One genuinely-decoded format replaces the "codecs aren't in this
  // container" blanket: WAV PCM is a pure byte-layout format (RIFF chunk
  // walk + little-endian samples), so the decoder is deterministic JVM code
  // with no native dependency — the same role libsndfile's PCM path plays.
  // Image/video codecs stay behind [[decodeStub]] (recorded in COVERAGE.md).

  /** Decoded PCM audio: header fields + interleaved integer samples
    * (8-bit WAV is unsigned, normalized here to signed −128..127; 16-bit is
    * signed −32768..32767 as stored).
    */
  final case class WavPcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
                          samples: Array[Int])

  /** Encode 16-bit PCM samples as a WAV file (RIFF header + fmt + data,
    * little-endian) — the writer half of the round-trip the decode oracle
    * proves. Interleaved samples, `channels` declared in the header.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Decode a WAV/RIFF PCM payload: walk the chunk list (chunks are
    * word-aligned — odd sizes carry a pad byte), read `fmt ` (PCM only,
    * 8- or 16-bit), then `data`. Unknown chunks (LIST, fact, …) are
    * skipped, like every conforming reader. Throws IllegalArgumentException
    * on non-RIFF/non-PCM payloads — decode failures must be loud, not
    * zero-filled.
    */
  def decodeWav(bytes: Array[Byte]): WavPcm = {
    require(bytes.length >= 12, s"WAV too short: ${bytes.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    buf.getInt // riff size (trust actual buffer bounds, not the header)
    require(fourCC() == "WAVE", "RIFF is not WAVE")
    var sampleRate = -1; var channels = -1; var bits = -1
    var data: Array[Byte] = null
    while (buf.remaining() >= 8 && data == null) {
      val id = fourCC(); val sz = buf.getInt
      require(sz >= 0 && sz <= buf.remaining(), s"chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          val fmtStart = buf.position()
          val audioFormat = buf.getShort & 0xffff
          require(audioFormat == 1, s"only PCM supported, got format $audioFormat")
          channels = buf.getShort & 0xffff
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort & 0xffff
          require(bits == 8 || bits == 16, s"only 8/16-bit PCM, got $bits")
          // skip fmt extensions + word-align pad; clamp — a trailing
          // odd-sized chunk may legally omit its pad byte in the wild
          buf.position(math.min(fmtStart + sz + (sz & 1), buf.limit()))
        case "data" =>
          data = new Array[Byte](sz); buf.get(data)
        case _ =>
          // skip + word-align pad; clamped like the fmt skip
          buf.position(math.min(buf.position() + sz + (sz & 1), buf.limit()))
      }
    }
    require(bits > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    val samples =
      if (bits == 8) data.map(b => (b & 0xff) - 128) // 8-bit WAV is unsigned
      else {
        val n = data.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        out
      }
    WavPcm(sampleRate, channels, bits, samples)
  }

  /** Decode WAV payloads per partition and emit exact integer features:
    * header fields + sample count + Σ|sample| + max |sample| — the
    * [[extractFeatures]] shape with a REAL decoder in the mapPartitions
    * seat. One decoder walk per blob, no shuffle.
    */
  def wavFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "bytes", "byte_len").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val w = decodeWav(r.bytes)
          var energy = 0L; var peak = 0L
          var i = 0
          while (i < w.samples.length) {
            val a = math.abs(w.samples(i).toLong)
            energy += a; if (a > peak) peak = a
            i += 1
          }
          (r.media_id, w.sampleRate, w.channels, w.bitsPerSample,
            w.samples.length.toLong, energy, peak)
        }
      }
      .toDF("media_id", "sample_rate", "channels", "bits", "n_samples",
        "energy", "peak")
  }

  /** Audio-shaped feature extraction: fixed-size sample WINDOWS per media
    * row (the frame/hop structure every audio featurizer — RMS, peak,
    * spectral stats per frame — runs on), computed as pure column
    * expressions. The "decoder" is the deterministic stand-in for a PCM
    * codec: each payload byte is one sample, its code point the amplitude
    * (exact for ASCII payloads; a real codec drops into mapPartitions like
    * [[extractFeatures]]). Per window: sample count, total energy (Σ code),
    * peak (max code) — all exact integers, oracle-checkable.
    *
    * Scale shape: window explosion is map-side row multiplication (no
    * shuffle), features are per-row expressions; the per-element `transform`
    * works on a BOUND window column, never re-deriving the payload.
    */
  def windowFeatures(media: DataFrame, windowSize: Int = 128): DataFrame = {
    val payload = decode(col("bytes"), "UTF-8")
    val nWin = greatest(
      ceil(length(col("payload")).cast("double") / windowSize).cast("long"), lit(1L))
    val wins = media.select(col("media_id"), payload.as("payload"))
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0L), nWin - 1)).as("win_no"))
      .select(col("media_id"), col("win_no"),
        col("payload").substr((col("win_no") * windowSize + 1).cast("int"),
          lit(windowSize)).as("w"))
    // guard: sequence(1, 0) is DESCENDING [1, 0], not empty — an empty
    // window must yield an empty code array
    val codes = when(length(col("w")) > 0,
      transform(sequence(lit(1), length(col("w"))),
        i => ascii(col("w").substr(i, lit(1))).cast("long")))
      .otherwise(typedLit(Seq.empty[Long]))
    wins.select(col("media_id"), col("win_no"), codes.as("codes"))
      .select(col("media_id"), col("win_no"),
        size(col("codes")).as("n_samples"),
        aggregate(col("codes"), lit(0L), (a, x) => a + x).as("energy"),
        coalesce(array_max(col("codes")), lit(0L)).as("peak"))
  }

  /** Frame/sample selection stub: every k-th fixed-size byte window as a
    * "frame" — demonstrates the explode-to-frames shape (video → frames)
    * without a codec. Frames are cut arithmetically with
    * `sequence`+`substring` (all codegen'd; a regex-split chunker breaks on
    * Spark's MIME-chunked `base64` — its CRLFs stop `.{n}` lookbehinds).
    * Empty payloads yield one empty frame. Returns
    * (media_id, frame_no, frame_b64).
    */
  def sampleFrames(media: DataFrame, frameSize: Int = 64, everyK: Int = 4): DataFrame = {
    // byte count derived from the payload itself — callers only need
    // (media_id, bytes), the original contract
    val byteLen = length(col("bytes")).cast("double")
    val lastFrame = greatest(ceil(byteLen / frameSize).cast("long") - 1L, lit(0L))
    media.select(col("media_id"), col("bytes"),
        explode(sequence(lit(0L), lastFrame)).as("frame_no"))
      .filter(col("frame_no") % everyK === 0)
      .select(col("media_id"), col("frame_no"),
        base64(col("bytes").substr((col("frame_no") * frameSize + 1).cast("int"),
          lit(frameSize))).as("frame_b64"))
  }
}
