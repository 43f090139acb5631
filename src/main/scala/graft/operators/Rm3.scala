package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** RM3 pseudo-relevance feedback (Lavrenko & Croft 2001 relevance
  * models; the Abdul-Jaleel et al. 2004 RM3 interpolation): run BM25,
  * mine expansion terms from the TOP-RANKED documents, and re-score with
  * the interpolated query — the corpus-driven complement to the
  * reference's static WordNet-style synonym expansion
  * (`/root/reference/query/enhancement.py:59-126`).
  *
  * Deterministic contract (what makes a two-pass iterative retrieval
  * value-oracle-able): every selection boundary is rounded-then-ordered —
  * pass-1 scores round to 4 dp before the (score DESC, doc_id) top-`fbDocs`
  * cut; expansion weights `w(t) = Σ_d tf(t,d)·s1(d)` round to 4 dp before
  * the (w DESC, term) top-`fbTerms` cut; normalized weights and the final
  * λ-interpolation round to 4 dp. Both engines make identical cuts.
  *
  * 100 TB shape: pass 1 is the standard pruned-postings BM25 plan; the
  * feedback-doc posting slice is |fbDocs| documents (a broadcast-joined
  * filter on the postings, bucket-prunable by doc); the expansion term
  * list is `fbTerms` rows on the driver (the same k-bounded collect the
  * serving paths use); pass 2 is again the pruned-postings plan with a
  * ≤fbTerms literal term list. Nothing scales beyond two postings scans.
  */
object Rm3 {

  /** Interpolation weight of the ORIGINAL query's scores. */
  val Lambda = 0.5

  private def round4(d: Double): Double =
    BigDecimal.valueOf(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Top-k RM3 retrieval: `(doc_id, score)` with
    * `score = round(λ·s1 + (1−λ)·Σ_t wn(t)·bm25term(t, d), 4)`,
    * ordered (score DESC, doc_id), positive scores only.
    */
  def rm3TopK(ix: Bm25.Index, spark: org.apache.spark.sql.SparkSession,
              query: String, k: Int, fbDocs: Int = 10, fbTerms: Int = 10,
              k1: Double = Bm25.K1, b: Double = Bm25.B): DataFrame = {
    import spark.implicits._
    val s1 = Bm25.scoreWithIndex(ix, spark, query, k1, b)
      .select(col("doc_id"), round(col("score"), 4).as("s1"))
    // pass-1 head — fbDocs rows on the driver (k-bounded, the serving
    // idiom), deterministic under the rounded (s1 DESC, doc_id) order
    val top = s1.orderBy(col("s1").desc, col("doc_id")).limit(fbDocs)
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getDouble(1))).toSeq
    val qTerms = TextFunctions.tokenizeBm25Value(spark, query).distinct
    val topDf = broadcast(top.toDF("doc_id", "s1d")
      .withColumn("doc_id",
        col("doc_id").cast(ix.postings.schema("doc_id").dataType)))
    // expansion-term mining: relevance-weighted term mass over the
    // feedback docs, original query terms excluded
    val expansion = ix.postings
      .join(topDf, "doc_id")
      .filter(!col("term").isin(qTerms: _*))
      .groupBy("term")
      .agg(round(sum(col("tf") * col("s1d")), 4).as("w"))
      .orderBy(col("w").desc, col("term")).limit(fbTerms)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    if (expansion.isEmpty)
      return s1.select(col("doc_id"), col("s1").as("score"))
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("doc_id")).limit(k)
    val wSum = expansion.map(_._2).sum
    val wn = expansion.map { case (t, w) => (t, round4(w / wSum)) }
    val expTerms = wn.map(_._1)
    val wnDf = broadcast(wn.toDF("term", "wn"))
    val stats = ix.idf.select("term", "idf")
      .filter(col("term").isin(expTerms: _*))
      .join(wnDf, "term")
    val pl =
      if (ix.postings.columns.contains("doc_len")) ix.postings
      else ix.postings.join(ix.lengths, "doc_id")
    val es = pl.filter(col("term").isin(expTerms: _*))
      .join(broadcast(stats), "term")
      .groupBy("doc_id")
      .agg(round(sum(col("wn") *
        Bm25.termScore(col("tf"), col("doc_len"), lit(ix.avgdl), col("idf"),
          k1, b)), 4).as("es"))
    // final precision is 5 dp, NOT 4: λ=0.5 of two 4 dp inputs is exactly
    // a 5 dp value, so rounding at 4 dp would sit exactly ON the half
    // boundary where Spark's BigDecimal(HALF_UP) and DuckDB's
    // multiply-then-nearbyint disagree (measured: 0.92805 → 0.928 vs
    // 0.9281). At 5 dp the blend is exactly representable — no boundary.
    s1.join(es, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(lit(Lambda) * coalesce(col("s1"), lit(0.0)) +
          lit(1.0 - Lambda) * coalesce(col("es"), lit(0.0)), 5).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }
}
