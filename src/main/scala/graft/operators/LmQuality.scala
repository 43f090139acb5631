package graft.operators

import org.apache.spark.sql.DataFrame
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
  * 100 TB: three corpus passes — the total-count aggregate (a driver
  * scalar), the vocabulary build (one map-side-combined groupBy(token);
  * post-combine cardinality = vocabulary size, not corpus size; truncated
  * to V rows and broadcast), and the scoring pass (per-row projection plus
  * one groupBy(doc) with partial aggregation). V is the broadcast-size knob
  * (1M vocab entries ≈ 20 MB — comfortably broadcastable).
  */
object LmQuality {
  val Micro = 1000000L

  /** Production default vocabulary size: the CCNet/KenLM regime the scorer
    * is designed around keeps O(100k–1M) head tokens — at a toy vocabulary
    * nearly every token is OOV and cross-entropy degenerates to the
    * constant ln(total)/1e6 for all docs, which would make downstream
    * perplexity rules (e.g. [[Curation.curationDecision]]'s
    * maxCrossEntropy) drop everything. Oracle queries pass their own small
    * vocabularies explicitly (the DuckDB twin encodes the same size).
    */
  val DefaultVocabSize = 200000

  /** (token, cost_micro) for the top-`vocabSize` tokens by corpus frequency,
    * ties broken by token text — deterministic for the oracle.
    */
  def vocabCosts(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame =
    vocabFor(tokenCounts(docs, textCol), totalTokens(docs, textCol), vocabSize)

  private def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokenize(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))

  /** Corpus token total as a driver scalar (0 for an empty/tokenless corpus). */
  private def totalTokens(docs: DataFrame, textCol: String): Long = {
    val row = tokenCounts(docs, textCol).agg(sum("c")).collect()
    if (row.isEmpty || row(0).isNullAt(0)) 0L else row(0).getLong(0)
  }

  private def vocabFor(counts: DataFrame, total: Long, vocabSize: Int): DataFrame =
    counts.orderBy(col("c").desc, col("token")).limit(vocabSize)
      .select(
        col("token"),
        floor(-log(col("c").cast("double") / lit(total.toDouble))
          * lit(Micro.toDouble)).cast("long").as("cost_micro"))

  /** Per-document cross-entropy under the corpus unigram LM:
    * (doc_id, n_tokens, cross_entropy nats/token, 4 dp).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            vocabSize: Int = DefaultVocabSize): DataFrame = {
    // the (token, count) table feeds the total (an eager collect), the
    // vocab head, AND nothing else — materialize the token explode+groupBy
    // ONCE (distinct-token-sized, tiny next to the corpus) instead of
    // re-running the corpus pass for each consumer
    val counts = tokenCounts(docs, textCol).localCheckpoint(true)
    val totalRow = counts.agg(sum("c")).collect()
    val total =
      if (totalRow.isEmpty || totalRow(0).isNullAt(0)) 0L
      else totalRow(0).getLong(0)
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokenize(col(textCol))).as("token"))
    if (total == 0L)
      // tokenless corpus: no scored rows, contract schema preserved
      return toks.select(col(idCol), lit(0L).as("n_tokens"),
        lit(0.0).as("cross_entropy")).limit(0)
    val vocab = vocabFor(counts, total, vocabSize)
    // OOV floor, as a literal: same JVM Math.log the codegen'd vocab costs
    // use, so driver-vs-executor evaluation cannot diverge
    val oovCost = math.floor(math.log(total.toDouble) * Micro.toDouble).toLong
    toks.join(broadcast(vocab), Seq("token"), "left")
      .select(col(idCol),
        coalesce(col("cost_micro"), lit(oovCost)).as("cost_micro"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("cost_micro").as("s"))
      .select(col(idCol), col("n_tokens"),
        round((col("s").cast("double") / col("n_tokens").cast("double"))
          / lit(Micro.toDouble), 4).as("cross_entropy"))
  }

  /** Production default bigram-table size: the Stupid-Backoff regime keeps
    * the head of the bigram distribution (~1M pairs ≈ 40 MB broadcast);
    * everything below backs off to α·p(w₂). Oracle queries pass their own
    * small sizes explicitly.
    */
  val DefaultBigramSize = 1000000

  /** Bigram LM scoring with Stupid Backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the web-scale n-gram
    * smoothing that needs no discount tuning): per-token cost is
    * −ln(c(w₁w₂)/c(w₁)) when the bigram is in the kept head, else
    * −ln(0.4·p(w₁... w₂ backoff)) from the unigram table, else the OOV
    * floor; the FIRST token always costs its unigram rate. This is the
    * rung between [[score]]'s unigram model and the 5-gram KenLM CCNet
    * itself runs — same contract, one more order of context.
    *
    * Determinism: every cost is micro-quantized at TABLE BUILD (floor·1e6
    * of a fixed double expression on integer-count operands), document
    * sums are exact 64-bit integer math; output is (id, n_tokens,
    * cost_micro) with cost_micro the summed integer (tokenless docs: 0).
    *
    * 100 TB: two counting passes (unigram and bigram groupBys, both
    * map-side combined, truncated to the V/B heads and broadcast) and one
    * scoring pass (the first-token stream plus the bigram-shingle stream,
    * both broadcast-joined, one groupBy(doc)). Partial 1-token "bigrams"
    * are EXCLUDED on both sides (len ≥ 2) — a single-token doc scores by
    * its unigram rate alone.
    */
  /** Entry budget for [[scoreBigram]]'s in-process rung: models whose
    * requested vocab+bigram heads fit ride the scoring pass as codegen
    * reference maps (one projection, no joins); larger models keep the
    * broadcast-join plan — the 100 TB shape.
    */
  val BigramInProcessEntries = 250000

  def scoreBigram(docs: DataFrame, idCol: String, textCol: String,
                  vocabSize: Int = DefaultVocabSize,
                  bigramSize: Int = DefaultBigramSize,
                  inProcessEntries: Int = BigramInProcessEntries): DataFrame = {
    val microD = lit(Micro.toDouble)
    val toksAll = docs.select(col(idCol),
      TextFunctions.tokenize(coalesce(col(textCol), lit(""))).as("toks"))
    val counts = toksAll.select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c")).localCheckpoint(true)
    val totalRow = counts.agg(sum("c")).collect()
    val total =
      if (totalRow.isEmpty || totalRow(0).isNullAt(0)) 0L
      else totalRow(0).getLong(0)
    // tokenless corpus: every document scores (0 tokens, 0 cost) — one row
    // per doc, matching both the documented contract and the f_lm_bigram
    // SQL twin (a limit(0) here would drop the rows entirely)
    if (total == 0L)
      return toksAll.select(col(idCol), lit(0L).as("n_tokens"),
        lit(0L).as("cost_micro"))
    val t = lit(total.toDouble)
    val uni = counts.orderBy(col("c").desc, col("token")).limit(vocabSize)
      .select(col("token"),
        floor(-log(col("c").cast("double") / t) * microD)
          .cast("long").as("cu"),
        floor(-log(lit(0.4) * (col("c").cast("double") / t)) * microD)
          .cast("long").as("cb"))
    // OOV floors: same op sequence driver-side as the column math above
    val cuOov = math.floor(-math.log(1.0 / total.toDouble) * Micro.toDouble).toLong
    val cbOov = math.floor(-math.log(0.4 * (1.0 / total.toDouble)) * Micro.toDouble).toLong
    val pairsAll = toksAll.filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(TextFunctions.shingles(col("toks"), 2)).as("pair"))
    val bg = pairsAll.groupBy("pair").agg(count(lit(1)).as("c2"))
      .join(counts.select(col("token").as("_w1"), col("c").as("c1")),
        substring_index(col("pair"), " ", 1) === col("_w1"))
      .orderBy(col("c2").desc, col("pair")).limit(bigramSize)
      .select(col("pair"),
        floor(-log(col("c2").cast("double") / col("c1").cast("double")) * microD)
          .cast("long").as("cb2"))
    // guarded in-process rung: a head-truncated model under the entry
    // budget scores as ONE codegen projection (the cost maps ride as
    // reference objects — integer values, so both paths sum identical
    // terms); larger models keep the broadcast-join plan below
    if (vocabSize.toLong + bigramSize.toLong <= inProcessEntries) {
      val uniMap = new java.util.HashMap[String, Array[Long]]()
      uni.collect().foreach(r =>
        uniMap.put(r.getString(0), Array(r.getLong(1), r.getLong(2))))
      val bgMap = new java.util.HashMap[String, java.lang.Long]()
      bg.collect().foreach(r => bgMap.put(r.getString(0), r.getLong(1)))
      return toksAll.select(col(idCol),
          graft.functions.FastFunctions.bigramCost(col("toks"), uniMap, bgMap,
            cuOov, cbOov).as("_bc"))
        .select(col(idCol),
          element_at(col("_bc"), 1).as("n_tokens"),
          element_at(col("_bc"), 2).as("cost_micro"))
    }
    val fc = toksAll.filter(size(col("toks")) >= 1)
      .select(col(idCol), element_at(col("toks"), 1).as("token"))
      .join(broadcast(uni), Seq("token"), "left")
      .select(col(idCol), coalesce(col("cu"), lit(cuOov)).as("cost"))
    val pc = pairsAll
      .join(broadcast(bg), Seq("pair"), "left")
      .join(broadcast(uni.select(col("token").as("_w2"), col("cb"))),
        substring_index(col("pair"), " ", -1) === col("_w2"), "left")
      .select(col(idCol),
        coalesce(col("cb2"), coalesce(col("cb"), lit(cbOov))).as("cost"))
    val sums = fc.unionByName(pc).groupBy(idCol)
      .agg(sum("cost").as("s"))
    toksAll.select(col(idCol), size(col("toks")).cast("long").as("n_tokens"))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("s"), lit(0L)).as("cost_micro"))
  }

  /** CCNet's head/middle/tail split: rank documents by cross-entropy and
    * cut at the ⌈n/3⌉-th and ⌈2n/3⌉-th VALUE (ties at a boundary all fall
    * on the better side — value-thresholded, so the split is deterministic
    * and engine-independent with no interpolated percentile).
    *
    * The scored table is persisted only while the size count and the two
    * threshold order statistics run, then released — the returned frame
    * recomputes the LM once when the caller acts on it (two LM passes
    * total, no storage pinned past the call).
    *
    * Scale note: the two thresholds here are exact order statistics via
    * sort-limit (fine to ~10⁸ rows); at 100 TB the same contract is served
    * by `approxQuantile` over `cross_entropy` with the bucketing map
    * unchanged — threshold selection is the only approximate step.
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   vocabSize: Int = DefaultVocabSize): DataFrame = {
    // ONE materialization serves the count, both threshold scans, AND the
    // returned projection — the previous persist/unpersist released the
    // cache before the returned (lazy) plan ran, so the whole 3-pass LM
    // scoring subtree recomputed on every downstream action
    val sc = score(docs, idCol, textCol, vocabSize).localCheckpoint(true)
    val n = sc.count()
    def kth(k: Long): Double = {
      val r = sc.orderBy(col("cross_entropy"), col(idCol))
        .limit(k.toInt).agg(max("cross_entropy")).collect()
      if (r.isEmpty || r(0).isNullAt(0)) Double.MaxValue else r(0).getDouble(0)
    }
    val (t1, t2) = (kth((n + 2) / 3), kth((2 * n + 2) / 3))
    sc.select(col(idCol), col("cross_entropy"),
      when(col("cross_entropy") <= lit(t1), "head")
        .when(col("cross_entropy") <= lit(t2), "middle")
        .otherwise("tail").as("bucket"))
  }
}
