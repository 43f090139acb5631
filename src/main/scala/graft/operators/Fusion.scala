package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-search result fusion (SURVEY §2.3 J3/J4, §2.4 A3).
  *
  * The reference fuses a vector-ranked list and a BM25-ranked list with
  * Reciprocal Rank Fusion (`/root/reference/query/search.py:311-347`,
  * k = 60) or a legacy max-normalized weighted merge
  * (`query/search.py:350-411`, vector_weight default 0.7).
  *
  * Scale shape: each ranked list is already top-k-truncated (tiny), so the
  * union-aggregate runs on ≤ 2k rows per query. For BATCHED queries the same
  * code works with an extra `query_id` key in every partitionBy/groupBy —
  * rank assignment stays a per-query window, never a global sort.
  */
object Fusion {
  val RrfK = 60

  /** Assign 1-based ranks to a scored list `(doc_id, score)`, highest score
    * first, doc_id tie-break for determinism (W1,
    * `/root/reference/query/search.py:335-340`).
    *
    * CONTRACT (rerankHead-style, GlobalWindowContractSpec): the global
    * `Window.orderBy` is safe ONLY because callers pass a top-k-truncated
    * list (≤ queryTopK/bm25MaxResults rows — KbPipeline truncates before
    * fusing, search.py does the same). The batched twin ([[rrfBatch]])
    * partitions by query_id; corpus-sized inputs belong there.
    */
  def ranked(scored: DataFrame, scoreCol: String): DataFrame =
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col("doc_id"))))

  /** RRF: score(d) = Σ_lists 1/(k + rank_list(d)). Union-aggregate, not a
    * join — absent docs simply contribute nothing.
    */
  def rrf(lists: Seq[DataFrame], k: Int = RrfK): DataFrame = {
    val contribs = lists.map { df =>
      ranked(df, "score").select(col("doc_id"),
        (lit(1.0) / (lit(k.toDouble) + col("rank"))).as("contrib"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(sum("contrib").as("rrf_score"))
  }

  /** Batched RRF: every input carries `(query_id, doc_id, score)`; ranks
    * are per-query windows (`partitionBy(query_id)`) so nothing is a global
    * sort — the batch variant of [[rrf]] for the many-queries regime.
    */
  def rrfBatch(lists: Seq[DataFrame], k: Int = RrfK): DataFrame = {
    val contribs = lists.map { df =>
      df.withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
        .select(col("query_id"), col("doc_id"),
          (lit(1.0) / (lit(k.toDouble) + col("rank"))).as("contrib"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("rrf_score"))
  }

  /** Batched weighted fusion: [[weighted]] with every window/join keyed by
    * `query_id` — max-normalization is per query, the merge is per
    * (query_id, doc_id). Inputs carry `(query_id, doc_id, score)`.
    */
  def weightedBatch(vector: DataFrame, keyword: DataFrame,
                    vectorWeight: Double = 0.7, bm25Weight: Double = 0.3): DataFrame = {
    val wSum = vectorWeight + bm25Weight
    val (vw, kw) = if (wSum > 0) (vectorWeight / wSum, bm25Weight / wSum) else (0.5, 0.5)
    val w = Window.partitionBy("query_id")
    def normalized(df: DataFrame, out: String): DataFrame =
      df.withColumn("mx", max(abs(col("score"))).over(w))
        .select(col("query_id"), col("doc_id"),
          (when(col("mx") > 0, col("score") / col("mx")).otherwise(lit(0.0))).as(out))
    normalized(vector, "vscore")
      .join(normalized(keyword, "kscore"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(col("vscore"), lit(0.0)) * vw +
          coalesce(col("kscore"), lit(0.0)) * kw).as("score"))
  }

  /** Legacy weighted fusion (`/root/reference/query/search.py:350-411`):
    * max-normalize each list's scores (A7), full-outer merge on doc_id,
    * weighted sum with missing scores as 0.
    */
  def weighted(vector: DataFrame, keyword: DataFrame, vectorWeight: Double = 0.7,
               bm25Weight: Double = 0.3): DataFrame = {
    // reference semantics (search.py:350-411, models.py:161): independent
    // vector_weight/bm25_weight, normalized to sum 1
    val wSum = vectorWeight + bm25Weight
    val (vw, kw) = if (wSum > 0) (vectorWeight / wSum, bm25Weight / wSum) else (0.5, 0.5)
    // max-normalize with an unpartitioned window: the lists are top-k-
    // bounded, and the window keeps each input consumed ONCE (an agg +
    // rejoin would recompute the full scoring subtree twice)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    def normalized(df: DataFrame, out: String): DataFrame =
      df.withColumn("mx", max(abs(col("score"))).over(w))
        .select(col("doc_id"),
          (when(col("mx") > 0, col("score") / col("mx")).otherwise(lit(0.0))).as(out))
    normalized(vector, "vscore")
      .join(normalized(keyword, "kscore"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(col("vscore"), lit(0.0)) * vw +
          coalesce(col("kscore"), lit(0.0)) * kw).as("score"))
  }
}
