package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (builder-prompt extension; the
  * DSIR recipe — Xie et al. 2023, arXiv:2302.03169 — select raw-corpus
  * documents whose hashed n-gram distribution looks like a small target
  * corpus). The reference has no distribution-matching selection rung at
  * all (its quality gates are per-document heuristics,
  * `/root/reference/utils/text_utils.py`); this is the standard way a
  * pretraining pipeline skims "Wikipedia-like" data out of a crawl.
  *
  * Model: features are unigrams + word bigrams hashed into `buckets`
  * buckets (the paper's hashed n-gram generative model). Both corpora get a
  * Laplace-smoothed bucket distribution p̂[b] = (c_b + 1) / (total + B);
  * a raw document's log importance weight is
  * Σ_features (ln p̂_target[bucket] − ln p̂_raw[bucket]) — positive means
  * "more target-like than raw-like". Selection takes the top weights
  * (the paper adds Gumbel noise for a soft sample; the deterministic
  * top-k is the rand()-free variant every sampler in [[Sampling]] uses —
  * retries and re-runs must draw identically).
  *
  * Cross-engine float determinism: each bucket's ln p̂ is micro-quantized
  * (floor · 1e6) into an integer the moment it is computed — the same
  * contract [[LmQuality]] uses — so the per-document sum is exact integer
  * math in any summation order; the final weight is one division rounded
  * to 4 dp.
  *
  * 100 TB: two aggregation passes build the bucket tables (map-side
  * combined groupBy(bucket) → at most B rows each; the target corpus is
  * small by definition), the B-entry log-ratio table rides the scoring
  * plan as a codegen REFERENCE OBJECT ([[graft.functions.DsirScoreExpr]]),
  * and scoring is a single zero-shuffle projection — one fused
  * tokenize+hash+lookup walk per document. No join, no explode, no
  * per-doc groupBy: the scoring pass touches each input split exactly
  * once, which is the property that matters when the raw side is the
  * 100 TB crawl.
  */
object Dsir {
  val Micro = 1000000L
  val DefaultBuckets = 1024

  /** Token array of one document (null text → empty). The FEATURE walk —
    * unigrams ++ word-bigram shingles with the 1-token partial-bigram
    * clamp — is `HashAlgos.eachDsirBucket`, shared by the codegen scoring
    * and counting expressions so the two passes cannot drift.
    */
  private def docTokens(textCol: Column): Column =
    TextFunctions.tokenize(coalesce(textCol, lit("")))

  /** Dense bucket-count array of one corpus: one codegen projection
    * (`dsir_buckets`), one map-side-combined aggregation collapsing to
    * ≤ B rows, collected. The only driver-side state is B longs — the
    * "centroid table" regime.
    */
  private def bucketCounts(docs: DataFrame, textCol: String,
                           buckets: Int): Array[Long] = {
    val rows = docs
      .select(explode(
        graft.functions.FastFunctions.dsirBuckets(docTokens(col(textCol)), buckets))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect()
    val arr = Array.fill(buckets)(0L)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Laplace-smoothed micro log-probability of every bucket in [0, B):
    * lp_micro[b] = floor(ln((c_b + 1) / (total + B)) · 1e6). Dense by
    * construction — unseen buckets get the smoothing floor.
    */
  private def microLps(counts: Array[Long]): Array[Long] = {
    val denom = (counts.sum + counts.length).toDouble
    counts.map(c => math.floor(
      math.log((c + 1).toDouble / denom) * Micro.toDouble).toLong)
  }

  /** The dense (bucket, lp_micro) table of a corpus — exactly `buckets`
    * rows; one aggregation job, Laplace math driver-side.
    */
  def bucketLogProbs(docs: DataFrame, textCol: String, buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    microLps(bucketCounts(docs, textCol, buckets)).zipWithIndex
      .map { case (lp, b) => (b.toLong, lp) }.toSeq
      .toDF("bucket", "lp_micro")
  }

  /** The B-entry micro log-ratio lp_target − lp_raw (index = bucket):
    * two aggregation jobs, everything else driver math over B longs.
    */
  private def logRatio(raw: DataFrame, textCol: String,
                       target: DataFrame, targetTextCol: String,
                       buckets: Int): Array[Long] = {
    val lpr = microLps(bucketCounts(raw, textCol, buckets))
    val lpt = microLps(bucketCounts(target, targetTextCol, buckets))
    Array.tabulate(buckets)(b => lpt(b) - lpr(b))
  }

  /** Per-raw-document importance weights: (id, n_feats, logw_micro, logw)
    * with logw_micro = Σ_features (lp_tgt − lp_raw) — an EXACT integer in
    * micro-nats (the oracle-checkable value; 0-feature docs keep 0) — and
    * logw its double rendering in nats for human consumption. The
    * returned frame's scoring pass is a zero-shuffle codegen projection —
    * the log-ratio table rides the plan as a reference object.
    */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, targetTextCol: String,
                        buckets: Int = DefaultBuckets): DataFrame = {
    val ratio = logRatio(raw, textCol, target, targetTextCol, buckets)
    raw.select(
        col(idCol),
        graft.functions.FastFunctions
          .dsirScore(docTokens(col(textCol)), buckets, ratio).as("_fs"))
      .select(col(idCol),
        element_at(col("_fs"), 1).as("n_feats"),
        element_at(col("_fs"), 2).as("logw_micro"))
      .withColumn("logw", col("logw_micro").cast("double") / lit(Micro.toDouble))
  }

  /** Deterministic importance resampling: the `n` most target-like raw
    * documents by (logw_micro desc, id asc) — the rand()-free stand-in for
    * the paper's Gumbel top-k (documented divergence: no noise, so repeated
    * near-duplicates are not diversified; run dedup first, as the paper
    * itself does).
    */
  def resample(weights: DataFrame, idCol: String, n: Int): DataFrame =
    weights.orderBy(col("logw_micro").desc, col(idCol)).limit(n)
}
