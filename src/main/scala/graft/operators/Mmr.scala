package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashAlgos, VectorFunctions}

/** Maximal Marginal Relevance diversification (Carbonell & Goldstein
  * 1998): greedily re-rank the top candidates so each pick balances
  * query relevance against similarity to what is already selected —
  * `mmr(d) = λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`. Builder-prompt
  * extension: the reference returns the raw fused ranking
  * (`/root/reference/query/search.py:510-511`); diversification is the
  * standard serving knob it lacks.
  *
  * Deterministic contract: candidate relevance rounds to 6 dp at the
  * top-`nCands` cut, pairwise sims round to 6 dp, and each greedy step's
  * value rounds at 7 dp — EXACT for λ=0.5 over 6 dp inputs (the RM3
  * half-boundary lesson: round at the precision the blend actually has,
  * never below it), ties broken by doc id. The SQL twin unrolls the k
  * greedy steps as CTEs making identical cuts.
  *
  * 100 TB shape: candidate retrieval is the standard distributed top-k
  * scan; everything after operates on `nCands` rows — the greedy loop is
  * a k-bounded driver computation (the rerank-head serving idiom,
  * `/root/reference/embedding/rerank_manager.py:216-220` analogue),
  * never a corpus-scale job.
  */
object Mmr {

  val Lambda = 0.5

  private def roundAt(d: Double, scale: Int): Double =
    BigDecimal.valueOf(d).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Greedy MMR selection over driver-held candidates:
    * `(id, rel6dp, vec)` → k picks of `(rank, id, mmr7dp)`.
    */
  private[graft] def select(cands: Seq[(Long, Double, Array[Float])],
                            k: Int, lambda: Double): Seq[(Int, Long, Double)] = {
    val sims = scala.collection.mutable.Map[(Long, Long), Double]()
    def sim(a: (Long, Double, Array[Float]), b: (Long, Double, Array[Float])): Double =
      sims.getOrElseUpdate((a._1, b._1),
        roundAt(HashAlgos.cosineF32(a._3, b._3), 6))
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Double, Array[Float])]()
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)]()
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val scored = remaining.map { c =>
        val pen = if (selected.isEmpty) 0.0
          else selected.map(s => sim(c, s)).max
        (c, roundAt(lambda * c._2 - (1.0 - lambda) * pen, 7))
      }
      val best = scored.minBy { case (c, v) => (-v, c._1) }
      out += ((rank, best._1._1, best._2))
      selected += best._1
      remaining -= best._1
      rank += 1
    }
    out.toSeq
  }

  /** BATCHED diversified retrieval: `(query_id, rank, doc_id, mmr)` —
    * every query's `nCands` candidates retrieved in ONE DataFrame DAG
    * (the bounded per-partition top-k aggregation over a broadcast query
    * set — the sim_knn_batch idiom; candidate vectors ride back on one
    * broadcast join), then the greedy selection runs per query on the
    * driver over |queries|·nCands rows — the k-bounded idiom [[mmrTopK]]
    * already uses, value-identical per query (same rounded-6dp relevance
    * cut by (rel DESC, id), same [[select]] recurrence).
    */
  def mmrTopKBatch(emb: DataFrame, idCol: String, vecCol: String,
                   queries: Seq[(Long, Seq[Float])], nCands: Int, k: Int,
                   lambda: Double = Lambda): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "empty MMR batch")
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query_id in batch")
    val qdf = broadcast(queries.toDF("query_id", "qvec"))
    val scored = emb.crossJoin(qdf)
      .select(col("query_id"), col(idCol).as("doc_id"),
        round(VectorFunctions.cosine(col(vecCol), col("qvec")), 6).as("rel"))
    val cands = TopK.explodeRanked(
        scored.groupBy("query_id")
          .agg(TopK.topK(nCands)(col("doc_id"), col("rel")).as("tk")),
        "tk", Seq("query_id"))
      .select(col("query_id"), col("doc_id"), col("score").as("rel"))
    val rows = broadcast(cands)
      .join(emb.select(col(idCol).as("doc_id"), col(vecCol).as("vec")),
        Seq("doc_id"))
      .select("query_id", "doc_id", "rel", "vec")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        r.getDouble(2), r.getSeq[Float](3).toArray))
    queries.flatMap { case (qid, _) =>
      val qc = rows.filter(_._1 == qid)
        .sortBy(c => (-c._3, c._2)) // the (rel DESC, id) candidate order
        .map(c => (c._2, c._3, c._4)).toSeq
      select(qc, k, lambda).map { case (rank, id, mmr) =>
        (qid, rank, id, mmr)
      }
    }.toDF("query_id", "rank", "doc_id", "mmr")
      .orderBy("query_id", "rank")
  }

  /** Top-k diversified retrieval: `(rank, doc_id, mmr)` for the greedy
    * MMR re-ranking of the `nCands` cosine-nearest candidates to `qvec`.
    */
  def mmrTopK(emb: DataFrame, idCol: String, vecCol: String,
              qvec: Seq[Float], nCands: Int, k: Int,
              lambda: Double = Lambda): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cands = emb
      .select(col(idCol),
        round(VectorFunctions.cosine(col(vecCol),
          VectorFunctions.vecLit(qvec)), 6).as("rel"),
        col(vecCol).as("vec"))
      .orderBy(col("rel").desc, col(idCol))
      .limit(nCands)
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getDouble(1),
        r.getSeq[Float](2).toArray))
      .toSeq
    select(cands, k, lambda)
      .toDF("rank", "doc_id", "mmr")
      .orderBy("rank")
  }
}
