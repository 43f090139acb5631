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

  /** Streaming BM25 index maintenance — the streaming twin of the
    * `bm25` + incremental-merge verbs: each micro-batch of newly landed
    * files chunks exactly like [[chunkStream]] and MERGES into the stored
    * index ([[graft.operators.Bm25.mergeIndex]] — postings append + term
    * stats recompute, never a full rebuild).
    *
    * Consistency model: every batch writes a fresh VERSIONED store
    * (`dir/v<batchId>`) and then atomically swaps the `CURRENT` pointer
    * (write-temp + rename) — readers never observe a half-written index,
    * and the merge never reads the files it is overwriting. foreachBatch
    * is at-least-once, so a replayed batch is made idempotent by the S5
    * anti-join: chunk ids already in the stored lengths table drop out,
    * and an all-duplicate replay leaves the pointer untouched. Old
    * versions are retained for GC by the caller (the pointer file is the
    * source of truth) — at 100 TB this is the standard
    * snapshot-and-swap index deployment shape.
    */
  def startIndexMaintenance(spark: SparkSession, glob: String, dir: String,
                            trigger: org.apache.spark.sql.streaming.Trigger =
                              org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    chunkStream(spark, glob).writeStream
      .option("checkpointLocation", s"$dir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainIndexBatch(spark, batch, dir, batchId)
      }
      .trigger(trigger)
      .start()

  /** The per-micro-batch maintenance step of [[startIndexMaintenance]] —
    * factored out so specs (and replay-idempotence tests) can drive it
    * directly with a deterministic batch.
    */
  private[graft] def maintainIndexBatch(spark: SparkSession, batch: DataFrame,
                                        dir: String, batchId: Long): Unit = {
    import graft.operators.Bm25
    val docs = batch.select(
      concat(col("sourcedoc"), lit("#"), col("sid")).as("doc_id"),
      col("chunk_text").as("text"))
    val next = s"$dir/v$batchId"
    currentIndexPath(dir) match {
      case None =>
        Bm25.writeIndex(Bm25.buildIndex(docs, "doc_id", "text"), next)
      case Some(prev) =>
        val old = Bm25.readIndex(spark, prev)
        val fresh = docs.join(old.lengths.select("doc_id"), Seq("doc_id"), "left_anti")
        if (fresh.head(1).isEmpty) return // full replay: nothing new, keep pointer
        Bm25.writeIndex(Bm25.mergeIndex(old, fresh, "doc_id", "text"), next)
    }
    swapPointer(dir, s"v$batchId")
  }

  /** The CURRENT index store under a maintenance root, if any. */
  def currentIndexPath(dir: String): Option[String] = {
    val f = new java.io.File(dir, "CURRENT")
    if (!f.exists()) None
    else Some(new java.io.File(dir,
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim).getPath)
  }

  private def swapPointer(dir: String, version: String): Unit = {
    val tmp = java.nio.file.Paths.get(dir, "CURRENT.tmp")
    java.nio.file.Files.write(tmp,
      version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Streaming dedup-at-ingest — the shape a 100 TB/day training pipeline
    * runs at the front door: each micro-batch of landed documents is
    * exact-deduped WITHIN the batch (canonical min-id survives), checked
    * against the accumulated lake through the bloom-prefiltered
    * fingerprint join ([[graft.operators.Dedup.incrementalBloom]] — lake
    * rows drop map-side on the bloom probe before the join), and only
    * never-seen documents append to the lake. Replay-idempotent without a
    * pointer: a replayed batch's fingerprints are already IN the lake, so
    * every row drops and nothing appends. The parquet append itself is
    * the one non-transactional step — at production scale the lake sits
    * in a table format with atomic commit (the seam is this function).
    */
  def startDedupIngest(spark: SparkSession, glob: String, dir: String,
                       trigger: org.apache.spark.sql.streaming.Trigger =
                         org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("text").option("wholetext", "true").load(glob)
      .select(input_file_name().as("doc_id"), col("value").as("text"))
      .writeStream
      .option("checkpointLocation", s"$dir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupIngestBatch(spark, batch, dir, batchId)
      }
      .trigger(trigger)
      .start()

  /** The per-micro-batch step of [[startDedupIngest]], spec-drivable. */
  private[graft] def dedupIngestBatch(spark: SparkSession, batch: DataFrame,
                                      dir: String, batchId: Long = 0L): Unit = {
    dedupIngestStep(spark, batch, dir, batchId); ()
  }

  /** [[dedupIngestBatch]] returning the MATERIALIZED survivor documents —
    * the composition seam [[kbMaintenanceBatch]] chains further stages on.
    */
  private[graft] def dedupIngestStep(spark: SparkSession, batch: DataFrame,
                                     dir: String, batchId: Long = 0L): DataFrame = {
    val out = dedupSurvivors(spark, batch, dir)
    appendToLake(out, dir, batchId)
    out
  }

  /** The COMPUTE half of [[dedupIngestStep]]: the batch's exact-dedup
    * survivors checked against the accumulated lake, MATERIALIZED
    * (localCheckpoint) but NOT committed — the survivor plan reads the same
    * lake files [[appendToLake]] extends, and [[kbMaintenanceBatch]] needs
    * to run every downstream stage before the lake commit so a crashed
    * batch can re-derive its work.
    */
  private[graft] def dedupSurvivors(spark: SparkSession, batch: DataFrame,
                                    dir: String): DataFrame = {
    import graft.operators.Dedup
    val canonIds = Dedup.exactGroups(batch, "doc_id", "text")
      .filter(col("dup_id") === col("keep_id"))
      .select(col("dup_id").as("doc_id"))
    val canon = batch.join(canonIds, "doc_id")
    val lakeDir = s"$dir/lake"
    val survivors =
      // Hadoop FS probe (the appendToLake ADVICE-r17 fix's sibling):
      // java.io.File answers false for every remote lake, which would
      // re-admit every already-committed document on a remote kb
      if (!graft.sources.KbStorage.pathExists(spark, lakeDir)) canon
      else {
        val lake = spark.read.parquet(lakeDir)
        // lakes written by [[appendToLake]] carry the fingerprint AT REST:
        // the dedup probe then scans only the lake's 8-byte fp column
        // (parquet column pruning) instead of re-cleaning + re-hashing the
        // full accumulated text every micro-batch — the scan that would
        // otherwise grow with the lake at 100 TB. Pre-fp lakes (or foreign
        // tables) fall back to computing it.
        val lakeFp =
          if (lake.columns.contains("fp"))
            lake.select(col("doc_id").as("keep_cand"), col("fp"))
          else lake.select(col("doc_id").as("keep_cand"),
            TextFunctions.fingerprint(col("text")).as("fp"))
        val dups = Dedup.incrementalBloomPrehashed(lakeFp, canon, "doc_id", "text")
          .filter(col("keep_id").isNotNull)
          .select(col("batch_id").as("doc_id"))
        canon.join(dups, Seq("doc_id"), "left_anti")
      }
    survivors.localCheckpoint(true)
  }

  /** The COMMIT half of [[dedupIngestStep]]: append (already-materialized)
    * survivor documents to the lake — the step that makes a replayed batch
    * drop out on its fingerprints. The fingerprint is stored AT REST so
    * later batches' dedup probes never re-hash lake text
    * ([[graft.operators.Dedup.incrementalBloomPrehashed]]).
    *
    * F16 lifecycle wiring (verdict r16 #5): every committed row is stamped
    * with `created_at = updated_at = changeTime` (the micro-batch id — the
    * stream's monotone logical clock; deterministic where the reference's
    * trigger uses wall-clock). The lake stays APPEND-ONLY — at 100 TB the
    * audit trigger can't be an in-place row update, so the lake is the CDC
    * log and [[lakeCurrent]] is the audited table view: a re-ingested
    * document with CHANGED content (new fingerprint, same doc_id) commits
    * as a new version row, and the view resolves the reference's
    * `migrations.py:253-283` AFTER UPDATE semantics per doc_id —
    * created_at sticky at the FIRST commit, updated_at bumped to the
    * LAST. A content-identical replay never reaches the commit (the
    * fingerprint dedup drops it), matching the reference where no UPDATE
    * statement fires. Pre-audit lakes keep their shape (same
    * mixed-schema rule as the fp column).
    */
  private[graft] def appendToLake(survivors: DataFrame, dir: String,
                                  changeTime: Long = 0L): Unit =
    if (survivors.head(1).nonEmpty) {
      val lakeDir = s"$dir/lake"
      // schema consistency: a pre-fp lake keeps its shape (mixed parquet
      // schemas in one directory would corrupt reads); fresh lakes and
      // fp-carrying lakes store the fingerprint. Existence goes through
      // the Hadoop FileSystem (ADVICE r17): java.io.File answers false
      // for every remote kb path, which would audit-stamp appends into a
      // pre-audit remote lake — exactly the mixed-schema corruption this
      // guard exists to prevent.
      val exists =
        graft.sources.KbStorage.pathExists(survivors.sparkSession, lakeDir)
      val lakeCols =
        if (exists) survivors.sparkSession.read.parquet(lakeDir).columns.toSet
        else Set.empty[String]
      val withFp = !exists || lakeCols.contains("fp")
      val withAudit = !exists || lakeCols.contains("created_at")
      val fpd =
        if (withFp)
          survivors.withColumn("fp", TextFunctions.fingerprint(col("text")))
        else survivors
      val out =
        if (withAudit)
          fpd.withColumn("created_at", lit(changeTime).cast("long"))
            .withColumn("updated_at", lit(changeTime).cast("long"))
        else fpd
      out.write.mode("append").parquet(lakeDir)
    }

  /** The audited CURRENT view of the append-only lake — one row per
    * doc_id carrying the LATEST committed content with the reference's
    * trigger-maintained audit columns resolved across all version rows:
    * `created_at` = the minimum commit stamp (sticky from the original
    * insert), `updated_at` = the maximum (bumped by every committed
    * update). Same one-shuffled-window plan as
    * [[graft.operators.Merge.upsertAudited]] generalized to N waves; ties
    * inside one commit stamp break on the fingerprint so the view is
    * deterministic. Pre-audit lakes (no stamp columns) get stamp 0 for
    * every row — the view still collapses to one row per doc_id.
    */
  def lakeCurrent(spark: SparkSession, dir: String): DataFrame = {
    val lake = spark.read.parquet(s"$dir/lake")
    val stamped =
      if (lake.columns.contains("created_at")) lake
      else lake.withColumn("created_at", lit(0L))
        .withColumn("updated_at", lit(0L))
    val keyed =
      if (stamped.columns.contains("fp")) stamped
      else stamped.withColumn("fp", TextFunctions.fingerprint(col("text")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val wOrd = w.orderBy(col("updated_at").desc, col("fp").desc)
    keyed
      .withColumn("_created", org.apache.spark.sql.functions.min(col("created_at")).over(w))
      .withColumn("_updated", org.apache.spark.sql.functions.max(col("updated_at")).over(w))
      .withColumn("_rn", row_number().over(wOrd))
      .filter(col("_rn") === 1)
      .withColumn("created_at", col("_created"))
      .withColumn("updated_at", col("_updated"))
      .drop("_rn", "_created", "_updated")
  }

  /** The WHOLE incremental lifecycle as one stream — the streaming twin of
    * the reference's `database → embed → bm25` verb sequence: each
    * micro-batch of landed files is deduplicated against the lake
    * ([[dedupIngestStep]]), the survivors chunk exactly like the batch
    * path, new content keys embed through the cache anti-join
    * ([[embedMaintenanceBatch]]), and the chunks merge into the versioned
    * BM25 store ([[maintainIndexBatch]]). Every stage is
    * replay-idempotent on its own artifact (chunk-id anti-join,
    * all-duplicate pointer freeze), and the lake append runs LAST — the
    * batch's commit point — so a crash anywhere mid-batch leaves the lake
    * unchanged and the retry re-derives the same survivors instead of
    * finding them "already ingested" with the embed/index work missing.
    * The at-least-once foreachBatch contract therefore holds end to end.
    */
  def startKbMaintenance(spark: SparkSession, glob: String, dir: String,
                         provider: graft.embed.Embedder.Provider,
                         surfaceGate: Boolean = false,
                         chunkSize: Int = 200, overlap: Int = 50,
                         trigger: org.apache.spark.sql.streaming.Trigger =
                           org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("text").option("wholetext", "true").load(glob)
      .select(input_file_name().as("doc_id"), col("value").as("text"))
      .writeStream
      .option("checkpointLocation", s"$dir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        kbMaintenanceBatch(spark, batch, dir, provider, batchId, surfaceGate,
          chunkSize, overlap)
      }
      .trigger(trigger)
      .start()

  /** The per-micro-batch step of [[startKbMaintenance]], spec-drivable.
    * `surfaceGate = true` drops documents failing the model-free curation
    * rules ([[graft.operators.Curation.surfaceKeep]]) BEFORE they touch
    * any artifact — junk never enters the lake, the cache, or the index.
    */
  private[graft] def kbMaintenanceBatch(spark: SparkSession, batch: DataFrame,
                                        dir: String,
                                        provider: graft.embed.Embedder.Provider,
                                        batchId: Long,
                                        surfaceGate: Boolean = false,
                                        chunkSize: Int = 200,
                                        overlap: Int = 50): Unit = {
    val gated =
      if (surfaceGate)
        batch.filter(graft.operators.Curation.surfaceKeep(col("text")))
      else batch
    // Crash-safety ordering: the lake append is the LAST write. If the
    // driver dies after any downstream stage, the retry re-derives the same
    // survivors (the lake is unchanged), and each stage drops already-done
    // work on ITS OWN artifact's anti-join (embeddings chunk ids, index
    // lengths doc_ids, all-duplicate pointer freeze). Appending the lake
    // FIRST would make the retry's survivors come back empty and the
    // documents would be permanently missing from the embeddings table and
    // the BM25 store.
    val survivors = dedupSurvivors(spark, gated, dir)
    if (survivors.head(1).isEmpty) return
    val chunks = survivors
      .select(col("doc_id").as("sourcedoc"),
        explode(Chunker.chunks(col("text"), chunkSize, overlap)).as("c"))
      .select(col("sourcedoc"), col("c.sid").as("sid"),
        col("c.chunk_text").as("chunk_text"))
      .withColumn("embedtext", TextFunctions.cleanText(col("chunk_text")))
      .localCheckpoint(true)
    embedMaintenanceBatch(spark, chunks, dir, provider)
    maintainIndexBatch(spark, chunks, dir, batchId)
    appendToLake(survivors, dir, batchId)
  }

  /** Streaming cache-aware embedding maintenance — the third leg of the
    * incremental lifecycle (ingest → dedup → EMBED → index): each
    * micro-batch of landed files chunks like [[chunkStream]], embeds ONLY
    * content keys absent from the accumulated cache table
    * ([[graft.embed.Embedder.embedWithCache]] — the M5 anti-join, so a
    * re-ingested or duplicated chunk never burns a provider call), appends
    * the new cache rows, and appends the per-chunk embedding rows.
    * Replay-idempotent the same way [[startDedupIngest]] is: a replayed
    * batch's chunk ids are already in the embeddings table and drop on the
    * id anti-join.
    */
  def startEmbedMaintenance(spark: SparkSession, glob: String, dir: String,
                            provider: graft.embed.Embedder.Provider,
                            trigger: org.apache.spark.sql.streaming.Trigger =
                              org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    chunkStream(spark, glob).writeStream
      .option("checkpointLocation", s"$dir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        embedMaintenanceBatch(spark, batch, dir, provider)
      }
      .trigger(trigger)
      .start()

  /** The per-micro-batch step of [[startEmbedMaintenance]], spec-drivable. */
  private[graft] def embedMaintenanceBatch(spark: SparkSession, batch: DataFrame,
                                           dir: String,
                                           provider: graft.embed.Embedder.Provider): Unit = {
    import graft.embed.Embedder
    val cacheDir = s"$dir/embcache"
    val vecDir = s"$dir/embeddings"
    val chunks0 = batch.select(
      concat(col("sourcedoc"), lit("#"), col("sid")).as("chunk_id"),
      col("embedtext"))
    // replay guard: chunk ids already embedded drop out entirely
    val chunks =
      if (!graft.sources.KbStorage.pathExists(spark, vecDir)) chunks0
      else chunks0.join(spark.read.parquet(vecDir).select("chunk_id"),
        Seq("chunk_id"), "left_anti")
    if (chunks.head(1).isEmpty) return
    val cache =
      if (graft.sources.KbStorage.pathExists(spark, cacheDir)) spark.read.parquet(cacheDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("content_key",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("embedding",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)))))
    val res = Embedder.embedWithCache(chunks, "embedtext", cache, provider)
    // materialize both outputs BEFORE the appends (their plans read the
    // same cache/embedding files the writes extend)
    val newCache = res.newCacheRows.localCheckpoint(true)
    val embedded = res.embedded
      .select(col("chunk_id"), col("content_key"), col("embedding"))
      .localCheckpoint(true)
    res.unpersist() // both outputs materialized above — release the miss cache
    if (newCache.head(1).nonEmpty)
      newCache.write.mode("append").parquet(cacheDir)
    if (embedded.head(1).nonEmpty)
      embedded.write.mode("append").parquet(vecDir)
  }

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
