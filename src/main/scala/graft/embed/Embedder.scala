package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.FastFunctions

/** Embedding generation as Spark jobs (SURVEY §2.9 M1-M6, §3.3).
  *
  * The reference's embed stage is an async per-batch HTTP loop with a
  * two-tier LRU+disk cache, retry/backoff, semaphore concurrency and
  * mid-run checkpoints (`/root/reference/embedding/embed_manager.py:421-523`).
  * Spark-native, every piece becomes a table operation:
  *
  *  - the CACHE is a persistent `(content_key, model, embedding)` table and
  *    "cache probe" is an equi-join (M5 ≡ J5);
  *  - "pending rows" is a left-anti join of chunks vs that table (P1/S5);
  *  - batching/concurrency/checkpointing are Spark's task model —
  *    `mapPartitions` batches per partition, task retries replace the
  *    hand-rolled backoff loop, and each task's output commit is the
  *    checkpoint;
  *  - dedup-before-embed (U3/J5, `embed_manager.py:669-677`) is a
  *    `dropDuplicates` on the content key before the provider call, then a
  *    join to propagate vectors to every duplicate row.
  */
object Embedder {

  /** Provider abstraction (M1). Implementations must be deterministic per
    * (model, text) so re-runs and task retries are idempotent — the property
    * the reference's cache keys rely on (`embed_manager.py:72-85`).
    *
    * A production HTTP provider implements `embedBatch` with a rate-limited
    * client per executor (built lazily inside mapPartitions, never
    * serialized from the driver) and idempotent retries; the contract is
    * batch-in/batch-out so the task boundary does the batching (M2-M4).
    */
  trait Provider extends Serializable {
    def model: String
    def dims: Int
    def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic provider — the same trick as the reference's test
    * fixtures (`/root/reference/tests/fixtures/mock_data.py:146-151`: seeded
    * RNG keyed by hash(text)). Component j of v(text) =
    * ((polyHash31(text + "|" + j) mod 1000) - 500) / 500 — pure integer
    * math, so the DuckDB oracle can reproduce whole-pipeline outputs.
    */
  final case class Deterministic(dims: Int) extends Provider {
    val model = s"deterministic-$dims"
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        Array.tabulate(dims) { j =>
          val h = hashComponent(t, j)
          ((h % 1000L).toFloat - 500f) / 500f
        }
      }

    private def hashComponent(t: String, j: Int): Long = {
      val s = t + "|" + j
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      h
    }
  }

  /** The deterministic embedding as a pure COLUMN expression — identical
    * values to [[Deterministic.embedBatch]], but runs inside codegen with no
    * mapPartitions. Used by oracle-checked queries; the mapPartitions path
    * exists to exercise the real provider plumbing. Implemented as the
    * [[graft.functions.DeterministicEmbedExpr]] codegen expression — one
    * rolling-hash pass over the text extended per component, not
    * dims × full-string re-scans through an interpreted HOF lambda.
    */
  def deterministicEmbed(text: Column, dims: Int): Column =
    FastFunctions.deterministicEmbed(text, dims)

  /** M1 batch embedding via mapPartitions: per-partition provider call with
    * the partition as the batch (M2's batch planning = partition sizing;
    * `coalesce`/`repartition` upstream controls batch size). Output schema:
    * input columns + `embedding ARRAY<FLOAT>`.
    */
  def embedPartitions(df: DataFrame, textCol: String, provider: Provider,
                      batchSize: Int = 256): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val vecs = provider.embedBatch(rows.map(_.getString(idx)))
        rows.lazyZip(vecs).map { (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(enc)
  }

  /** M5/J5/P1: cache-aware embedding. `cache` is the persistent embeddings
    * table `(content_key, embedding)` for `provider.model`; rows whose key
    * already exists are joined, only MISSES call the provider, and
    * duplicate texts are embedded once (U3) with vectors propagated back by
    * the key join. Returns df + `content_key` + `embedding`, and the new
    * cache rows to append.
    */
  final case class CacheResult(embedded: DataFrame, newCacheRows: DataFrame) {
    /** The miss-embeddings are persisted (both outputs consume them); the
      * CALLER owns the release — call after materializing both outputs.
      */
    def unpersist(): Unit = { newCacheRows.unpersist(); () }
  }

  def contentKey(text: Column): Column = sha2(text, 256)

  def embedWithCache(df: DataFrame, textCol: String, cache: DataFrame,
                     provider: Provider, batchSize: Int = 256): CacheResult = {
    val keyed = df.withColumn("content_key", contentKey(col(textCol)))
    // null-text rows can never match the key join (null = nothing) — drop
    // them from the miss set EXPLICITLY so they don't burn a provider call
    // before silently vanishing from the inner-joined output anyway
    val misses = keyed.select("content_key", textCol).dropDuplicates("content_key")
      .filter(col("content_key").isNotNull)
      .join(cache.select("content_key"), Seq("content_key"), "left_anti")
    // persist: `fresh` is consumed by BOTH the result join and newCacheRows —
    // without it each action re-runs the provider (2x API calls/billing, and
    // divergent vectors if a real provider is not perfectly deterministic)
    val fresh = embedPartitions(misses, textCol, provider, batchSize)
      .select(col("content_key"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dedup the cache side of the lookup: two concurrent runs can both
    // append the same key, and a duplicated cache row must not fan out
    // every later chunk with that key (vectors per key are identical —
    // content-keyed — so keeping either copy is correct)
    val lookup = cache.select("content_key", "embedding")
      .dropDuplicates("content_key").unionByName(fresh)
    CacheResult(keyed.join(lookup, "content_key"), fresh)
  }

  /** M6 dim probe: embed one sample row and read the vector length (the
    * reference probes the remote model, `embed_manager.py:616-626`).
    */
  def probeDims(provider: Provider): Int =
    provider.embedBatch(Seq("dimension probe")).head.length

  /** Per-model request token limits (`embed_manager.py:239-247`). */
  val ModelTokenLimits: Map[String, Int] = Map(
    "text-embedding-3-small" -> 8191,
    "text-embedding-3-large" -> 8191,
    "text-embedding-ada-002" -> 8191,
    "gemini-embedding-001" -> 30720)

  /** M2 batch planning (`embed_manager.py:216-257`): estimate tokens per
    * chunk from a sample (whitespace words × a 1.3 multiplier), divide the
    * model's request token limit, cap by `maxBatchSize` (and the 100-item
    * hard limit for gemini models), floor at 1. Here the batch size feeds
    * [[embedPartitions]]'s per-task grouping — partition sizing stays the
    * macro knob, this sizes the provider calls inside each task.
    */
  def optimalBatchSize(sampleTexts: Seq[String], model: String,
                      maxBatchSize: Int, tokenMultiplier: Double = 1.3): Int = {
    if (sampleTexts.isEmpty) math.max(1, maxBatchSize)
    else {
      val avgTokens = sampleTexts
        .map(t => t.split("\\s+").count(_.nonEmpty) * tokenMultiplier)
        .sum / sampleTexts.size
      val limit = ModelTokenLimits.getOrElse(model, 8191)
      val byTokens =
        if (avgTokens > 0) math.min(maxBatchSize, (limit / avgTokens).toInt)
        else maxBatchSize
      val capped =
        if (model.startsWith("gemini-")) math.min(byTokens, 100) else byTokens
      math.max(1, capped)
    }
  }

  /** [[optimalBatchSize]] over a chunk table: samples the first
    * `sampleSize` rows (the reference samples `chunks[:10]`) — one tiny
    * collect, not a scan.
    */
  def planBatchSize(df: DataFrame, textCol: String, model: String,
                    maxBatchSize: Int, sampleSize: Int = 10): Int =
    optimalBatchSize(
      df.select(textCol).limit(sampleSize).collect().map(_.getString(0)).toSeq,
      model, maxBatchSize)

  /** Column twin of [[optimalBatchSize]] (M2), for planning batch sizes for
    * MANY models/corpora in one job instead of one driver collect each:
    * given the sample's summed whitespace word count and row count, apply
    * the same `limit / (mean words × 1.3)` formula, the gemini 100-item cap
    * and the ≥1 floor. Association order is sum-then-multiply (the driver
    * version averages per-text products; equal on every fixture — see
    * EmbedderPlanSpec — though not bit-guaranteed for adversarial counts
    * straddling an integer quotient).
    */
  def batchSizeCol(model: Column, tokenLimit: Column, sumWordCounts: Column,
                   nSample: Column, maxBatchSize: Int): Column = {
    val avgTokens = sumWordCounts.cast("double") * lit(1.3) / nSample.cast("double")
    val byTokens = when(avgTokens > 0,
      least(lit(maxBatchSize), floor(tokenLimit.cast("double") / avgTokens).cast("int")))
      .otherwise(lit(maxBatchSize))
    val capped = when(model.startsWith("gemini-"), least(byTokens, lit(100)))
      .otherwise(byTokens)
    greatest(lit(1), capped)
  }

  /** Whitespace word count matching [[optimalBatchSize]]'s
    * `split("\\s+").count(_.nonEmpty)`. */
  def wordCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** A provider error that retrying cannot fix (bad credentials, payload
    * over the model limit, malformed request): [[Retrying]] rethrows it
    * immediately instead of sleeping through the full backoff schedule.
    * Real HTTP providers wrap their permanent-status responses (4xx minus
    * 429) in this; transient failures (timeouts, 429, 5xx) stay plain.
    */
  final class NonRetryableException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** M3 retry with exponential backoff + jitter
    * (`/root/reference/embedding/embed_manager.py:296-333`: backoff
    * min(tries², 30s) + proportional jitter). Wraps any provider; runs
    * INSIDE the executor task, complementing Spark's own task-level retry.
    * Jitter is seeded per batch so retries are deterministic in tests.
    * [[NonRetryableException]] and thread interrupts fail fast — a
    * permanent misconfiguration must not cost the full backoff schedule
    * per task before surfacing.
    */
  /** The (base_ms, jitter_ms) backoff pair for retry attempt `tries` at
    * jitter phase `phase` ∈ [0,100) — the exact math [[Retrying]] sleeps on
    * (`/root/reference/embedding/embed_manager.py:296-333`: backoff
    * min(tries², 30 s) + proportional jitter), factored out so the whole
    * schedule is a checkable table, not a side effect inside a catch block.
    */
  def backoffMs(tries: Int, phase: Int): (Long, Long) = {
    val base = math.min(tries.toLong * tries, 30L) * 1000
    val jitter = (base * 0.1 * (phase / 100.0)).toLong
    (base, jitter)
  }

  /** M3's retry schedule as DATA: one row per (try_no ∈ [1,maxRetries],
    * phase ∈ [0,100)) with the base, jitter, and total sleep [[Retrying]]
    * would pay — `(try_no, phase, base_ms, jitter_ms, sleep_ms)`. Built by
    * the SAME [[backoffMs]] the retry loop calls, so the oracle checks the
    * production math, not a re-derivation.
    */
  def backoffSchedule(spark: org.apache.spark.sql.SparkSession,
                      maxRetries: Int = 20): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (for { t <- 1 to maxRetries; p <- 0 until 100 } yield {
      val (base, jitter) = backoffMs(t, p)
      (t, p, base, jitter, base + jitter)
    }).toDF("try_no", "phase", "base_ms", "jitter_ms", "sleep_ms")
  }

  final case class Retrying(inner: Provider, maxRetries: Int = 20,
                            sleeper: Long => Unit = Thread.sleep) extends Provider {
    def model: String = inner.model
    def dims: Int = inner.dims
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      var tries = 0
      while (true) {
        try return inner.embedBatch(texts)
        catch {
          case e: NonRetryableException => throw e
          case e: InterruptedException => throw e
          case e: Exception if tries < maxRetries =>
            tries += 1
            val (base, jitter) = backoffMs(tries, texts.hashCode.abs % 100)
            sleeper(base + jitter)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }
}
