package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation metrics — nDCG@k, MRR, precision@k,
  * recall@k per query (Järvelin & Kekäläinen 2002 for DCG): the
  * measurement layer a retrieval engine needs to compare its own tiers
  * (the reference ships none; its quality claims are prose,
  * `/root/reference/README.md:59`).
  *
  * Determinism: the DCG discount uses the NATURAL log (the 1/ln(rank+1)
  * discount — nDCG is a ratio, so the log base cancels and ln avoids
  * engine-specific log2 implementations); gains are `2^grade − 1` with
  * small integer grades (exact doubles); MRR is max over relevant ranks
  * of 1/rank; everything rounds to 4 dp.
  *
  * 100 TB shape: rankings and qrels are k-bounded per query, so every
  * aggregation here is (queries × k) rows — evaluation cost never
  * scales with the corpus.
  */
object RetrievalMetrics {

  /** Per-query metrics of `ranking (query_id, doc_id, rank)` against
    * `qrels (query_id, doc_id, grade)` (grade > 0 = relevant):
    * `(query_id, n_rel, hits, ndcg, mrr, p_at_k, r_at_k)` ordered by
    * query_id. Queries present in `ranking` with no qrels score zeros.
    *
    * Reduced-reference shape (r19, verdict #4): the m15 callers pass whole
    * retrieval DAGs as `ranking`/`qrels`, and the previous form referenced
    * qrels THREE times (scored join, ideal-DCG window, n_rel count) and
    * ranking twice (scored, query-list distinct) — each reference a full
    * copy of the argument subtree in the plan. Two fusions, keeping every
    * join a broadcast (a full-outer single-join form was tried first and
    * measured SLOWER — the sort-merge full-outer machinery cost more jobs
    * and task time than the duplicated subtrees it removed; see
    * OPTIMIZATION_r19.md):
    *  - ideal DCG and n_rel come from ONE pass over the relevant qrels
    *    (the row_number window that ordered the ideal gains also counts
    *    the rows — n_rel = count per query, idcg = sum of the irk <= k
    *    gain terms, identical term sets to the old filter-then-number
    *    subtrees);
    *  - the scored aggregation runs over ALL ranking rows with the
    *    rank <= k guard INSIDE each aggregate instead of pre-filtering,
    *    so its per-query groups are exactly the distinct ranking query
    *    set and the separate distinct + left-join base disappears.
    */
  def evaluate(ranking: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val g = coalesce(col("grade"), lit(0.0))
    val scored = ranking.join(qrels, Seq("query_id", "doc_id"), "left")
      .groupBy("query_id")
      .agg(
        sum(when(col("rank") <= k,
          (pow(lit(2.0), g) - 1.0) / log(col("rank") + 1.0))).as("dcg"),
        sum(when(col("rank") <= k && g > 0, 1L).otherwise(0L)).as("hits"),
        max(when(col("rank") <= k && g > 0, lit(1.0) / col("rank"))
          .otherwise(0.0)).as("rr"))
    val qstats = qrels.filter(col("grade") > 0)
      .withColumn("irk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("grade").desc, col("doc_id"))))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_rel"),
        sum(when(col("irk") <= k,
          (pow(lit(2.0), col("grade")) - 1.0) / log(col("irk") + 1.0)))
          .as("idcg"))
    scored.join(qstats, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        // coalesce dcg BEFORE the ratio: a query whose ranking rows all
        // sit beyond k leaves dcg NULL, and a NULL dcg inside the when()
        // would yield NULL ndcg instead of the documented 0.0
        round(when(coalesce(col("idcg"), lit(0.0)) > 0,
          coalesce(col("dcg"), lit(0.0)) / col("idcg")).otherwise(0.0), 4)
          .as("ndcg"),
        round(coalesce(col("rr"), lit(0.0)), 4).as("mrr"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / k, 4)
          .as("p_at_k"),
        round(when(coalesce(col("n_rel"), lit(0L)) > 0,
          coalesce(col("hits"), lit(0L)).cast("double") / col("n_rel"))
          .otherwise(0.0), 4).as("r_at_k"))
      .orderBy("query_id")
  }
}
