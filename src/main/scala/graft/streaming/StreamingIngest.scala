package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.ingest.Chunker

/** Structured Streaming extensions (SURVEY §1.1: "Structured Streaming is
  * an extension opportunity (incremental ingest), not a reference
  * requirement" — the reference has no streaming at all, §2.10).
  *
  * Two production shapes a 100 TB training-data pipeline needs:
  *
  *  1. '''Incremental ingest''' — the streaming twin of
  *     [[graft.ingest.Ingest.ingestFiles]]: a file-source stream watches a
  *     landing directory, new files chunk/clean/derive EXACTLY like the
  *     batch verb (same column functions — one code path, two execution
  *     modes), and append to the chunk table. Replaces the reference's
  *     `--force`/anti-join re-scan loop with exactly-once file tracking
  *     (checkpointed file index).
  *
  *  2. '''Windowed event aggregation''' with watermarking — late events
  *     beyond the watermark are dropped deterministically; output is
  *     append-mode per closed window (the `events` table models this).
  */
object StreamingIngest {

  /** Streaming chunk ingest: text files under `glob` → canonical chunk rows.
    * Identical derivations to the batch path — the DataFrame program is the
    * contract, batch/streaming is an execution detail.
    */
  def chunkStream(spark: SparkSession, glob: String,
                  chunkSize: Int = 200, overlap: Int = 50): DataFrame = {
    val files = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(glob)
      .select(col("value").as("text"))
      .withColumn("sourcedoc", input_file_name())
    files
      .select(col("sourcedoc"),
        explode(Chunker.chunks(col("text"), chunkSize, overlap)).as("c"))
      .select(col("sourcedoc"), col("c.sid").as("sid"),
        col("c.chunk_text").as("chunk_text"))
      .withColumn("embedtext", TextFunctions.cleanText(col("chunk_text")))
      .withColumn("bm25_tokens", TextFunctions.tokenizeBm25(col("chunk_text")))
  }

  /** Start the ingest stream writing parquet + checkpoint under `outDir`. */
  def startIngest(spark: SparkSession, glob: String, outDir: String,
                  trigger: org.apache.spark.sql.streaming.Trigger =
                    org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    chunkStream(spark, glob).writeStream
      .format("parquet")
      .option("path", s"$outDir/chunks")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .start()

  /** Streaming keep-first dedup: `dropDuplicatesWithinWatermark` on the key
    * columns — dedup state is BOUNDED by the watermark horizon (grows with
    * distinct keys per window, not with stream length), the property that
    * makes exactly-once dedup viable on an unbounded 100 TB/day stream.
    * Streaming keeps the first ARRIVAL per key within the horizon; the
    * batch twin (the oracle-checked `stream_dedup` query) keeps the first
    * EVENT-TIME row via a window — same operator family, the deterministic
    * batch form is what an oracle can check.
    */
  def dedupStream(events: DataFrame, tsCol: String, keys: Seq[String],
                  watermark: String = "30 minutes",
                  tieBreak: Seq[String] = Nil): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else {
      // batch twin keeps the first EVENT-TIME row deterministically —
      // dropDuplicates would keep an arbitrary (partition-order-dependent)
      // row and silently break the documented keep-first contract. Rows
      // that tie on the timestamp ITSELF need `tieBreak` (e.g. an event id)
      // to stay deterministic — the oracle-checked stream_dedup query
      // orders by (micros, event_id) for exactly this reason.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
        .orderBy((tsCol +: tieBreak).map(col): _*)
      events.withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }

  /** Stream-stream interval join: rows match when keys are equal AND the
    * right timestamp falls in `[left.ts - lowerSec, left.ts + upperSec]`.
    * BOTH sides carry watermarks and the join condition bounds the time
    * range — the two requirements Structured Streaming needs to EXPIRE join
    * state (without them state grows with stream length; with them it is
    * bounded by watermark + range, the only shape that survives an
    * unbounded 100 TB/day pair of streams). Works identically on batch
    * frames (the oracle-checked `stream_interval_join` query) — watermarks
    * are no-ops in batch.
    *
    * The right side's columns are prefixed `r_` so self-joins (clicks ⋈
    * views of the same events stream) need no caller-side renames.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, lowerSec: Long, upperSec: Long,
                   watermark: String = "30 minutes"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(tsCol, watermark) else left
    val rRenamed = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, s"r_$c"))
    val r = if (rRenamed.isStreaming) rRenamed.withWatermark(s"r_$tsCol", watermark)
            else rRenamed
    l.join(r,
      col(keyCol) === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(tsCol) - expr(s"INTERVAL $lowerSec SECONDS") &&
        col(s"r_$tsCol") <= col(tsCol) + expr(s"INTERVAL $upperSec SECONDS"))
  }

  /** Watermarked sliding-window event counts: event-time windows of
    * `windowDur` sliding `slideDur`, late data beyond `watermark` dropped.
    * Works identically over a batch DataFrame (for the oracle-checked
    * `stream_window_agg` query) and a stream.
    */
  def windowedEventCounts(events: DataFrame, tsCol: String,
                          windowDur: String = "10 minutes",
                          slideDur: String = "5 minutes",
                          watermark: String = "15 minutes"): DataFrame = {
    val withTime = events.withColumn("event_time", col(tsCol))
    val streaming = withTime.isStreaming
    val base = if (streaming) withTime.withWatermark("event_time", watermark) else withTime
    base
      .groupBy(window(col("event_time"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"))
  }
}
