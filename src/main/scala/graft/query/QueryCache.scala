package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.embed.Embedder

/** The reference's two QUERY-side caches, re-expressed as cache-table
  * JOINS (the other two of its four caches already serve this way:
  * chunk-embedding = m5, enhancement = f6):
  *
  *  - query-EMBEDDING cache (`query/embedding.py:47-143` — an in-process
  *    dict keyed by the query string): here exactly
  *    [[Embedder.embedWithCache]] applied to the QUERY table — content-key
  *    join for hits, one anti-join isolates misses for the provider;
  *  - RERANK-SCORE cache (`embedding/rerank_manager.py:25-130` — an LRU of
  *    (query, passage) → score): [[rerankWithCache]] below, keyed by
  *    (query content key, candidate id).
  *
  * Serving contract (what the m16 oracles prove): a cache HIT's value is
  * READ from the table, never recomputed — the warm-pass plan touches the
  * scorer/provider only for misses, and a hit ≡ recompute because both
  * caches are keyed by full content. 100 TB shape: the cache is a table
  * like any other — hits are one equi-join against it (broadcastable while
  * small, shuffle-join when not), misses are one anti-join, and appends
  * are the returned `newCacheRows`; nothing is resident driver state.
  */
object QueryCache {

  /** `scored` = every candidate with its `rscore` (hits read from cache,
    * misses computed); `newCacheRows` = the computed misses,
    * `(query_key, <idCol>, rscore)`, for the caller to append.
    */
  final case class RerankCache(scored: DataFrame, newCacheRows: DataFrame)

  /** Score candidate pairs through a `(query_key, <idCol>, rscore)` cache
    * table. `cands` must carry the query text (`qTextCol`), the candidate
    * id (`idCol`), and whatever columns `scoreCol` reads (doc text/tokens);
    * the output keeps every `cands` column plus `query_key` and `rscore`.
    * Hits take their score FROM THE TABLE; only misses evaluate
    * `scoreCol`, once, and come back as `newCacheRows`.
    */
  def rerankWithCache(cands: DataFrame, qTextCol: String, idCol: String,
                      cache: DataFrame, scoreCol: Column): RerankCache = {
    val keyed = cands.withColumn("query_key",
      Embedder.contentKey(col(qTextCol)))
    // dedup the lookup side: a duplicated cache row (two concurrent
    // appends of the same key) must not fan out candidates — scores per
    // (query, doc) key are identical, so either copy is correct
    val lookup = cache.select(col("query_key"), col(idCol), col("rscore"))
      .dropDuplicates("query_key", idCol)
    val hits = keyed.join(lookup, Seq("query_key", idCol))
    // persist: misses feed BOTH the result union and newCacheRows — without
    // it each action re-evaluates the scorer (2× model calls for a real
    // cross-encoder, the cost the cache exists to avoid)
    val misses = keyed
      .join(lookup.select(col("query_key"), col(idCol)),
        Seq("query_key", idCol), "left_anti")
      .withColumn("rscore", scoreCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RerankCache(hits.unionByName(misses),
      misses.select(col("query_key"), col(idCol), col("rscore")))
  }

  /** Single-query serving form of the query-embedding cache: hit = one
    * pushdown-filtered read of the at-rest cache table (the scan prunes
    * on `content_key = <literal>`), miss = one provider call + one
    * appended row. This is what the `query` CLI verb runs per request —
    * the reference's in-process dict (`query/embedding.py:47-143`)
    * re-expressed as a table the whole cluster shares; the batched join
    * form ([[Embedder.embedWithCache]]) covers bulk paths and m16 proves
    * hit ≡ recompute value-exactly.
    */
  def embedQueryCached(spark: org.apache.spark.sql.SparkSession,
                       cacheDir: String, text: String,
                       provider: Embedder.Provider): Array[Float] = {
    // the cache identity is (model, dims, content): vectors from different
    // embedding models live in different subdirectories, so an `edit` that
    // switches models (or a re-embed that changes vector_dimensions) can
    // never serve a stale vector of the wrong space. Model names sanitize
    // to a path token; the dims ride separately so a same-name dims change
    // still separates. Pre-keying caches (rows at the cacheDir ROOT) are
    // deliberately ORPHANED, not migrated: an unkeyed entry carries no
    // record of which model produced it, so serving it would be exactly
    // the stale-model bug the keying exists to prevent — those entries
    // cost one re-embed each and the dead files are harmless.
    val dir = s"$cacheDir/${provider.model.replaceAll("[^A-Za-z0-9_.-]", "_")}" +
      s"_${provider.dims}"
    val key = contentKeyValue(text)
    val hit =
      if (graft.sources.KbStorage.pathExists(spark, dir))
        spark.read.parquet(dir)
          .filter(col("content_key") === key)
          .select("embedding").take(1).headOption
      else None
    hit match {
      // belt and braces: a hit of the wrong length (a corrupt or
      // hand-migrated cache) recomputes instead of serving a vector the
      // cosine stage would silently mis-score
      case Some(r) if r.getSeq[Float](0).size == provider.dims =>
        r.getSeq[Float](0).toArray
      case _ =>
        val v = provider.embedBatch(Seq(text)).head
        import spark.implicits._
        Seq((key, v)).toDF("content_key", "embedding")
          .coalesce(1).write.mode("append").parquet(dir)
        v
    }
  }

  /** Driver-side twin of [[Embedder.contentKey]] (sha2 hex, lowercase). */
  private[graft] def contentKeyValue(text: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** A provider that REFUSES to embed — wiring it into a warm pass turns
    * "the cache served every row" from an assumption into a property the
    * run itself enforces (any miss crashes instead of silently
    * recomputing). The m16_query_cache oracle's second pass runs on this.
    */
  /** @param mirrorModel the REAL provider's model name to impersonate —
    *   [[embedQueryCached]] keys its at-rest cache by (model, dims), so a
    *   warm-pass refuser must look up the same cache the real provider
    *   filled (empty = the standalone `cache-only-<dims>` identity).
    */
  def refusingProvider(dimensions: Int,
                       mirrorModel: String = ""): Embedder.Provider =
    new Embedder.Provider {
      val model =
        if (mirrorModel.nonEmpty) mirrorModel else s"cache-only-$dimensions"
      val dims = dimensions
      def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
        throw new IllegalStateException(
          s"cache miss reached the provider for ${texts.size} text(s): " +
            texts.headOption.getOrElse(""))
    }
}
