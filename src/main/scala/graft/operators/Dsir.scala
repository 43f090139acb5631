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
  * small by definition), the B-entry log-ratio table collapses to a plan
  * LITERAL array, and scoring is a single zero-shuffle projection —
  * `aggregate` over each row's feature array indexes the literal. No join,
  * no explode, no per-doc groupBy: the scoring pass touches each input
  * split exactly once, which is the property that matters when the raw
  * side is the 100 TB crawl.
  */
object Dsir {
  val Micro = 1000000L
  val DefaultBuckets = 1024

  /** Feature array of one document: analysis tokens ++ word-bigram
    * shingles (a short doc's partial bigram clamp mirrors
    * [[TextFunctions.shingles]]; null text → empty array).
    */
  private def features(textCol: Column): Column = {
    val toks = TextFunctions.tokenize(coalesce(textCol, lit("")))
    concat(toks, TextFunctions.shingles(toks, 2))
  }

  private def bucketOf(feat: Column, buckets: Int): Column =
    pmod(TextFunctions.polyHash(feat), lit(buckets.toLong))

  /** Laplace-smoothed micro log-probability of every bucket in [0, B):
    * exactly `buckets` rows of (bucket, lp_micro), lp_micro =
    * floor(ln((c_b + 1) / (total + B)) · 1e6). Buckets the corpus never
    * hits get the smoothing floor — the table is dense by construction so
    * the ratio lookup below never misses.
    */
  def bucketLogProbs(docs: DataFrame, textCol: String, buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    val counts = docs
      .select(explode(features(col(textCol))).as("feat"))
      .select(bucketOf(col("feat"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("t"))
    spark.range(buckets).toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(total))
      .select(col("bucket"),
        floor(log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double")
            / (coalesce(col("t"), lit(0L)) + lit(buckets.toLong)).cast("double"))
          * lit(Micro.toDouble)).cast("long").as("lp_micro"))
  }

  /** The B-entry micro log-ratio lp_target − lp_raw as a driver array
    * (index = bucket). Two tiny collects — B longs, the "centroid table"
    * regime; at 100 TB this is the only driver-side state.
    */
  private def logRatio(raw: DataFrame, textCol: String,
                       target: DataFrame, targetTextCol: String,
                       buckets: Int): Array[Long] = {
    val lpr = bucketLogProbs(raw, textCol, buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lpt = bucketLogProbs(target, targetTextCol, buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Array.tabulate(buckets)(b => lpt(b.toLong) - lpr(b.toLong))
  }

  /** Per-raw-document importance weights: (id, n_feats, logw_micro, logw)
    * with logw_micro = Σ_features (lp_tgt − lp_raw) — an EXACT integer in
    * micro-nats (the oracle-checkable value; 0-feature docs keep 0) — and
    * logw its double rendering in nats for human consumption. The
    * returned frame's scoring pass is a zero-shuffle projection — the
    * log-ratio table rides the plan as a B-element literal.
    */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, targetTextCol: String,
                        buckets: Int = DefaultBuckets): DataFrame = {
    val ratio = logRatio(raw, textCol, target, targetTextCol, buckets)
    val ratioLit = typedLit(ratio.toSeq)
    val feats = features(col(textCol))
    raw.select(
        col(idCol),
        size(feats).cast("long").as("n_feats"),
        aggregate(feats, lit(0L),
          (acc, f) => acc + element_at(ratioLit, bucketOf(f, buckets).cast("int") + 1))
          .as("logw_micro"))
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
