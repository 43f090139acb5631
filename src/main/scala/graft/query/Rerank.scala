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
