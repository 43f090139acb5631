package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Cross-encoder-style reranking (SURVEY §2.9 M7, §2.6 T4;
  * `/root/reference/embedding/rerank_manager.py`).
  *
  * The reference fetches each hit's text (N point queries → here ONE
  * broadcast join, J7), scores (query, text) pairs with a CrossEncoder in a
  * thread pool, reranks only the head `reranking_top_k` (20) hits and
  * appends the untouched tail (`rerank_manager.py:216-220,268-271,295-331`).
  *
  * The scoring function is pluggable:
  *  - [[lexicalScore]] — deterministic token-overlap (Jaccard) scorer, a
  *    pure column expression: the stand-in for the model, oracle-checkable;
  *  - a real cross-encoder drops in as a `mapPartitions` scorer with an
  *    executor-cached ONNX session (same shape as [[graft.embed.Embedder
  *    .embedPartitions]]) — the hit set is tiny so this is one task.
  */
object Rerank {

  /** Deterministic relevance score: |Q ∩ D| / |Q ∪ D| over distinct
    * BM25-tokenized token sets.
    */
  def lexicalScore(queryText: String, doc: Column): Column = {
    val q = TextFunctions.tokenizeBm25(lit(queryText))
    val d = array_distinct(TextFunctions.tokenizeBm25(doc))
    val inter = size(array_intersect(d, q))
    val union = size(array_union(d, q))
    when(union > 0, inter.cast("double") / union.cast("double")).otherwise(lit(0.0))
  }

  /** The pluggable scoring seam the reference fills with ms-marco-MiniLM
    * (`rerank_manager.py:133-277`): anything that maps (query text, doc
    * column) to a score COLUMN reranks through the same head/tail plumbing.
    * [[LexicalScorer]] is the oracle-checkable default; [[LogisticScorer]]
    * is a LEARNED model trained in-repo (no egress) that proves the swap
    * path end to end — a real cross-encoder drops in as a third
    * implementation with a `mapPartitions` scoring column.
    */
  trait Scorer {
    def score(queryText: String, doc: Column): Column
  }

  /** Default scorer — exactly [[lexicalScore]]; every m7 oracle runs on it. */
  case object LexicalScorer extends Scorer {
    override def score(queryText: String, doc: Column): Column =
      lexicalScore(queryText, doc)
  }

  /** Resolve the KB config's `rerank_scorer` knob. Unknown names fall back
    * to the lexical default (the reference tolerates unknown model names
    * the same way — deterministic fallback, not a crash).
    */
  def scorerFor(name: String): Scorer = name match {
    case "learned" => LogisticScorer.pretrained
    case _         => LexicalScorer
  }

  /** Learned logistic scorer over deterministic relevance FEATURES —
    * σ(w·f + b) with f = (token-set jaccard, query-term coverage,
    * saturating length prior). All three features are pure column
    * expressions, so the learned model scores inside whole-stage codegen
    * exactly like the lexical stand-in; only the WEIGHTS are learned.
    * Train with [[LogisticScorer.train]] on (features, label) examples —
    * e.g. a click log or a synthetic relevance set.
    */
  final case class LogisticScorer(w: Array[Double], b: Double) extends Scorer {
    require(w.length == LogisticScorer.NumFeatures,
      s"expected ${LogisticScorer.NumFeatures} weights, got ${w.length}")
    override def score(queryText: String, doc: Column): Column =
      fromFeatures(LogisticScorer.featureCols(queryText, doc))

    /** Batched column form (mirrors [[lexicalScoreCols]]'s shape). */
    def scoreCols(queryToks: Column, doc: Column): Column =
      fromFeatures(LogisticScorer.featureColsQ(queryToks, doc))

    private def fromFeatures(f: Seq[Column]): Column = {
      val z = f.zip(w).map { case (c, wi) => c * lit(wi) }
        .reduce(_ + _) + lit(b)
      lit(1.0) / (lit(1.0) + exp(-z))
    }

    /** Driver-side mirror of [[score]] over token SETS — the in-process
      * serving rung's scorer (must stay value-identical to the column
      * form; spec-pinned like the lexical rung). StrictMath.exp, not
      * Math.exp: Spark's codegen'd EXP calls StrictMath, and the two can
      * differ by 1 ulp — enough to break the rung-identity pin.
      */
    def scoreValue(q: Set[String], d: Set[String]): Double = {
      val f = LogisticScorer.featuresOf(q, d)
      val z = f.zip(w).map { case (fi, wi) => fi * wi }.sum + b
      1.0 / (1.0 + java.lang.StrictMath.exp(-z))
    }
  }

  object LogisticScorer {
    val NumFeatures = 3

    /** The feature columns — the SINGLE definition shared by serving and
      * by [[featuresOf]] (the driver-side mirror training uses); a drifted
      * copy would train weights against features serving never computes.
      *  f0 = |Q∩D| / |Q∪D|   (the lexical jaccard)
      *  f1 = |Q∩D| / |Q|     (query coverage — how much of the ASK is met)
      *  f2 = |D| / (|D|+20)  (saturating length prior)
      */
    def featureCols(queryText: String, doc: Column): Seq[Column] =
      featureColsQ(TextFunctions.tokenizeBm25(lit(queryText)), doc)

    /** [[featureCols]] with the query tokens as a COLUMN — the batched
      * form (each row carries its own query). The query side is
      * DISTINCTed so the coverage denominator matches [[featuresOf]]'s
      * set semantics even when an enhanced query repeats a term.
      */
    def featureColsQ(queryToks: Column, doc: Column): Seq[Column] = {
      val q = array_distinct(queryToks)
      // null text scores as the empty token set (σ(b), all features 0) —
      // matches featuresOf(q, ∅); bare null would poison the coverage
      // feature into a NULL score
      val d = array_distinct(TextFunctions.tokenizeBm25(coalesce(doc, lit(""))))
      val inter = size(array_intersect(d, q)).cast("double")
      val union = size(array_union(d, q)).cast("double")
      Seq(
        when(union > 0, inter / union).otherwise(lit(0.0)),
        when(size(q) > 0, inter / size(q).cast("double")).otherwise(lit(0.0)),
        size(d).cast("double") / (size(d).cast("double") + lit(20.0)))
    }

    /** Driver-side mirror of [[featureCols]] over already-tokenized
      * DISTINCT token sets (training data is token sets by construction).
      */
    def featuresOf(q: Set[String], d: Set[String]): Array[Double] = {
      val inter = (q intersect d).size.toDouble
      val union = (q union d).size.toDouble
      Array(
        if (union > 0) inter / union else 0.0,
        if (q.nonEmpty) inter / q.size else 0.0,
        d.size.toDouble / (d.size.toDouble + 20.0))
    }

    /** Seeded synthetic relevance set — the in-repo stand-in for a click
      * log: relevant documents cover ≥3 of the 4 query terms (plus noise
      * tokens), irrelevant ones ≤1; labels depend on COVERAGE, not noise
      * volume, so the trained weights must favor the coverage feature
      * over the plain jaccard the lexical scorer computes.
      */
    def syntheticRelevance(queryTerms: Set[String],
                           seed: Long = 42L): Seq[(Array[Double], Int)] = {
      val noise = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "theta", "lambda", "sigma", "omega")
      val rnd = new scala.util.Random(seed)
      val qs = queryTerms.toVector.sorted
      (0 until 200).map { i =>
        val relevant = i % 2 == 0
        val nQuery = if (relevant) 3 + rnd.nextInt(2) else rnd.nextInt(2)
        val nNoise = rnd.nextInt(7)
        val doc = (rnd.shuffle(qs).take(nQuery) ++
          rnd.shuffle(noise).take(nNoise)).toSet
        (featuresOf(queryTerms, doc), if (relevant) 1 else 0)
      }
    }

    /** The default learned model (`rerank_scorer = learned` in KB config):
      * trained once, lazily, on the seeded synthetic relevance set. The
      * features are all size-normalized (jaccard, coverage, length
      * prior), so the term identities in the training fixture don't
      * matter — the weights generalize across queries.
      */
    lazy val pretrained: LogisticScorer =
      train(syntheticRelevance(Set("spark", "join", "filter", "window")))

    /** Plain batch gradient descent on log loss — examples are (features,
      * label∈{0,1}). Deterministic: no randomness, fixed iteration order.
      * Training sets here are tiny (relevance judgments, not corpora), so
      * driver-side GD is the right tool; a corpus-scale trainer would be
      * one `treeAggregate` per epoch with the same update rule.
      */
    def train(examples: Seq[(Array[Double], Int)], epochs: Int = 500,
              lr: Double = 0.5): LogisticScorer = {
      require(examples.nonEmpty, "training needs at least one example")
      val w = new Array[Double](NumFeatures)
      var b = 0.0
      val n = examples.size.toDouble
      var e = 0
      while (e < epochs) {
        val gw = new Array[Double](NumFeatures)
        var gb = 0.0
        examples.foreach { case (f, y) =>
          var z = b
          var i = 0
          while (i < NumFeatures) { z += w(i) * f(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val err = p - y
          i = 0
          while (i < NumFeatures) { gw(i) += err * f(i); i += 1 }
          gb += err
        }
        var i = 0
        while (i < NumFeatures) { w(i) -= lr * gw(i) / n; i += 1 }
        b -= lr * gb / n
        e += 1
      }
      LogisticScorer(w, b)
    }
  }

  /** [[lexicalScore]] with the query tokens as a COLUMN — the batched form
    * where each row carries its own query (set semantics identical:
    * intersect/union are distinct either way).
    */
  def lexicalScoreCols(queryToks: Column, doc: Column): Column = {
    val d = array_distinct(TextFunctions.tokenizeBm25(doc))
    val inter = size(array_intersect(d, queryToks))
    val union = size(array_union(d, queryToks))
    when(union > 0, inter.cast("double") / union.cast("double")).otherwise(lit(0.0))
  }

  /** Batched [[rerankHead]]: N queries in one DAG — every window is
    * partitioned by `qidCol`, so ranking/rescoring shuffles once on
    * query_id and nothing is global. Head size and tail semantics are
    * per-query identical to the single-query form.
    */
  def rerankHeadBatch(hits: DataFrame, qidCol: String, scoreCol: String,
                      topK: Int, scorer: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy(col(qidCol))
    val ranked = hits.withColumn("orig_rank",
      row_number().over(byQ.orderBy(col(scoreCol).desc, col("doc_id"))))
    val head = ranked.filter(col("orig_rank") <= topK)
      .withColumn("rerank_score", scorer)
    val tail = ranked.filter(col("orig_rank") > topK)
      .withColumn("rerank_score", lit(null).cast("double"))
    val rescoredHead = head.withColumn("new_rank",
      row_number().over(byQ.orderBy(col("rerank_score").desc, col("doc_id"))))
    val keptTail = tail.withColumn("new_rank", col("orig_rank"))
    rescoredHead.unionByName(keptTail)
      .withColumn("final_rank",
        row_number().over(byQ.orderBy(
          when(col("new_rank") <= topK && col("rerank_score").isNotNull, lit(0)).otherwise(lit(1)),
          col("new_rank"))))
      .drop("orig_rank", "new_rank")
  }

  /** T4 head/tail rerank: rows ranked ≤ topK by `orderCol` are re-scored
    * and reordered by (new score desc, doc_id); the tail keeps its original
    * order after the head. Returns the input columns + `rerank_score` +
    * `final_rank`.
    *
    * ==Contract: bounded, single-query input==
    * This form ranks with GLOBAL windows (`Window.orderBy`, no partition
    * key), which execute on one partition — correct and cheap ONLY because
    * every caller feeds a top-k-truncated single-query hit set
    * (KbPipeline.query caps at `bm25MaxResults` + `queryTopK` rows before
    * reranking; the reference's own rerank sees ≤ top-k hits,
    * `rerank_manager.py:216-220`). Feeding an untruncated scored corpus
    * would serialize it through one task. For MULTIPLE queries — or
    * anything unbounded — use [[rerankHeadBatch]], whose windows partition
    * by query id (spec-asserted: no global window in its plan).
    */
  def rerankHead(hits: DataFrame, scoreCol: String, topK: Int,
                 scorer: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = hits.withColumn("orig_rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col("doc_id"))))
    val head = ranked.filter(col("orig_rank") <= topK)
      .withColumn("rerank_score", scorer)
    val tail = ranked.filter(col("orig_rank") > topK)
      .withColumn("rerank_score", lit(null).cast("double"))
    val rescoredHead = head.withColumn("new_rank",
      row_number().over(Window.orderBy(col("rerank_score").desc, col("doc_id"))))
    val keptTail = tail.withColumn("new_rank", col("orig_rank"))
    rescoredHead.unionByName(keptTail)
      .withColumn("final_rank",
        row_number().over(Window.orderBy(
          when(col("new_rank") <= topK && col("rerank_score").isNotNull, lit(0)).otherwise(lit(1)),
          col("new_rank"))))
      .drop("orig_rank", "new_rank")
  }
}
