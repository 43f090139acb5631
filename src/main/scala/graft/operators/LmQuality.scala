package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unigram language-model quality scoring (builder-prompt extension; the
  * CCNet/Wikipedia-LM filtering recipe — Wenzek et al. 2020, arXiv:1911.00359
  * — score each document by its cross-entropy under a corpus LM and filter
  * the high-perplexity tail). The reference's quality signals are surface
  * ratios only (`/root/reference/utils/text_utils.py` length/stopword
  * heuristics); this adds the distribution-aware rung a training-data
  * pipeline layers on top.
  *
  * Model: a top-V unigram vocabulary with maximum-likelihood token
  * probabilities p(w) = count(w) / total; out-of-vocabulary tokens back off
  * to the 1/total floor. Doc score = mean negative log-prob (nats/token) —
  * low = fluent/common, high = rare/garbled.
  *
  * Cross-engine float determinism: each token's -ln p(w) is micro-quantized
  * (floor · 1e6) into an integer cost the moment it is computed, so the
  * per-document sum is exact integer math and independent of Spark's
  * aggregation order; the final mean is one fixed division tree rounded to
  * 4 dp — the same contract the BM25 oracle uses.
  *
  * 100 TB: the vocabulary build is one map-side-combined groupBy(token)
  * (post-combine cardinality = vocabulary size, not corpus size) truncated
  * to V rows; costs broadcast to the scoring join, so scoring is a per-row
  * projection plus one groupBy(doc) with partial aggregation. V is the
  * broadcast-size knob (1M vocab entries ≈ 20 MB — comfortably
  * broadcastable).
  */
object LmQuality {
  val Micro = 1000000L

  /** (token, cost_micro) for the top-`vocabSize` tokens by corpus frequency
    * (ties broken by token text — deterministic for the oracle), plus the
    * corpus total in every row for the OOV floor.
    */
  def vocabCosts(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    val toks = docs.select(explode(TextFunctions.tokenize(col(textCol))).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("t"))
    counts.orderBy(col("c").desc, col("token")).limit(vocabSize)
      .crossJoin(broadcast(total))
      .select(
        col("token"),
        floor(-log(col("c").cast("double") / col("t").cast("double"))
          * lit(Micro.toDouble)).cast("long").as("cost_micro"),
        col("t"))
  }

  /** Per-document cross-entropy under the corpus unigram LM:
    * (doc_id, n_tokens, cross_entropy nats/token, 4 dp).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            vocabSize: Int = 24): DataFrame = {
    val vocab = vocabCosts(docs, textCol, vocabSize)
    val oov = floor(log(col("t").cast("double")) * lit(Micro.toDouble)).cast("long")
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokenize(col(textCol))).as("token"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      // every row carries `t` only on vocab hits; the OOV floor needs it too
      .drop("t")
      .crossJoin(broadcast(vocab.agg(max("t").as("t"))))
      .select(col(idCol),
        coalesce(col("cost_micro"), oov).as("cost_micro"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("cost_micro").as("s"))
      .select(col(idCol), col("n_tokens"),
        round((col("s").cast("double") / col("n_tokens").cast("double"))
          / lit(Micro.toDouble), 4).as("cross_entropy"))
  }

  /** CCNet's head/middle/tail split: rank documents by cross-entropy and
    * cut at the ⌈n/3⌉-th and ⌈2n/3⌉-th VALUE (ties at a boundary all fall
    * on the better side — value-thresholded, so the split is deterministic
    * and engine-independent with no interpolated percentile).
    *
    * Scale note: the two thresholds here are exact order statistics via
    * sort-limit (fine to ~10⁸ rows); at 100 TB the same contract is served
    * by `approxQuantile` over `cross_entropy` with the bucketing map
    * unchanged — threshold selection is the only approximate step.
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   vocabSize: Int = 24): DataFrame = {
    // persisted: the scored table feeds the size count, both threshold
    // order statistics, and the final bucketing — one LM pass, not four
    val sc = score(docs, idCol, textCol, vocabSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = sc.count()
    def kth(k: Long): DataFrame =
      sc.orderBy(col("cross_entropy"), col(idCol)).limit(k.toInt)
        .agg(max("cross_entropy"))
    val t1 = kth((n + 2) / 3).select(col("max(cross_entropy)").as("t1"))
    val t2 = kth((2 * n + 2) / 3).select(col("max(cross_entropy)").as("t2"))
    sc.crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      .select(col(idCol), col("cross_entropy"),
        when(col("cross_entropy") <= col("t1"), "head")
          .when(col("cross_entropy") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }
}
