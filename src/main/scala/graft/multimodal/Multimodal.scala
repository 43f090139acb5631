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
  * The actual image/audio codecs are NOT in this container, so [[decodeStub]]
  * is a clearly-marked deterministic fake; the Spark-side plumbing — schema,
  * batch shape, per-partition execution, metadata extraction — is real and
  * tested. Swap `decodeStub` for a JNI/ONNX decoder per executor in
  * production.
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
