package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020,
  * arXiv:2004.12832 — MaxSim): builder-prompt extension beyond the
  * reference's single-vector search (`/root/reference/query/search.py:194`
  * scores one pooled embedding per chunk; late interaction keeps one
  * embedding PER TOKEN and scores
  * `score(q, d) = Σ_{t ∈ tokens(q)} max_{s ∈ tokens(d)} cos(E(t), E(s))`).
  *
  * 100 TB shape — the key identity is that `cos(E(t), E(s))` depends only
  * on the token STRINGS, so the max over a document's tokens equals the
  * max over its DISTINCT tokens, and the token-pair similarity table only
  * needs the corpus VOCABULARY × the (broadcast-small) query tokens:
  *  1. one corpus pass explodes distinct tokens per document;
  *  2. the vocabulary (distinct tokens — millions, not billions) is
  *     embedded as a codegen projection and cross-joined with the ≤dozens
  *     of query tokens into a broadcast similarity table;
  *  3. the corpus token stream broadcast-joins that table, then two
  *     map-side-combinable aggregations (max per (doc, qtok), sum per
  *     doc) and a TakeOrderedAndProject finish — no shuffle ever carries
  *     more than the corpus token stream, and nothing is quadratic in
  *     corpus size.
  */
object LateInteraction {

  /** Embed a token column with the deterministic per-token embedder. */
  private def embedTok(tok: Column, dims: Int): Column =
    graft.embed.Embedder.deterministicEmbed(tok, dims)

  /** MaxSim scores for every document against `queryTokens`
    * (pre-tokenized, deduplicated by the caller): `(id, score)` with the
    * score rounded to 4 dp (the cross-engine double-sum convention).
    * Documents with no tokens have no score row.
    */
  def maxSimScores(docs: DataFrame, idCol: String, textCol: String,
                   queryTokens: Seq[String], dims: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dtok = docs.select(col(idCol),
      explode(array_distinct(TextFunctions.tokenize(col(textCol)))).as("tok"))
    val vocab = dtok.select("tok").distinct()
      .select(col("tok"), embedTok(col("tok"), dims).as("tvec"))
    val qdf = queryTokens.distinct.sorted.toDF("qtok")
      .select(col("qtok"), embedTok(col("qtok"), dims).as("qvec"))
    val sims = vocab.crossJoin(broadcast(qdf))
      .select(col("tok"), col("qtok"),
        VectorFunctions.cosine(col("tvec"), col("qvec")).as("sim"))
    dtok.join(broadcast(sims), Seq("tok"))
      .groupBy(col(idCol), col("qtok"))
      .agg(max("sim").as("ms"))
      .groupBy(idCol)
      .agg(round(sum("ms"), 4).as("score"))
  }

  /** Top-k late-interaction retrieval over a raw query text (tokenized
    * with the standard analysis tokenizer, deduplicated): `(id, score)`
    * ordered by (score DESC, id) — deterministic under score ties.
    */
  def maxSimTopK(docs: DataFrame, idCol: String, textCol: String,
                 queryText: String, k: Int, dims: Int = 8): DataFrame = {
    val toks = tokenizeValue(queryText)
    maxSimScores(docs, idCol, textCol, toks, dims)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Batched MaxSim: top-k per query for a (broadcast-small) query batch,
    * `(query_id, id, score, rank)`. The corpus token pass and the
    * vocabulary embedding are SHARED across the whole batch — the
    * similarity table grows to vocab × Σ|qᵢ| (still vocabulary-scale),
    * and the per-query top-k is one ranking window. This is the serving
    * shape: batch width amortizes the corpus pass exactly like
    * [[graft.pipeline.KbPipeline.queryBatch]].
    */
  def maxSimTopKBatch(docs: DataFrame, idCol: String, textCol: String,
                      queries: Seq[(Long, String)], k: Int,
                      dims: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dtok = docs.select(col(idCol),
      explode(array_distinct(TextFunctions.tokenize(col(textCol)))).as("tok"))
    val vocab = dtok.select("tok").distinct()
      .select(col("tok"), embedTok(col("tok"), dims).as("tvec"))
    val qdf = queries
      .flatMap { case (qid, t) => tokenizeValue(t).distinct.map((qid, _)) }
      .toDF("query_id", "qtok")
      .select(col("query_id"), col("qtok"),
        embedTok(col("qtok"), dims).as("qvec"))
    val sims = vocab.crossJoin(broadcast(qdf))
      .select(col("tok"), col("query_id"), col("qtok"),
        VectorFunctions.cosine(col("tvec"), col("qvec")).as("sim"))
    val sc = dtok.join(broadcast(sims), Seq("tok"))
      .groupBy(col(idCol), col("query_id"), col("qtok"))
      .agg(max("sim").as("ms"))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum("ms"), 4).as("score"))
    sc.withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col(idCol))))
      .filter(col("rank") <= k)
  }

  /** Driver-side twin of [[TextFunctions.tokenize]] on one string (the
    * spec contract: lowercase, split on non-alphanumerics, drop empties).
    */
  private[graft] def tokenizeValue(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)
}
