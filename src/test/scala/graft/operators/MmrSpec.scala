package graft.operators

import graft.SparkSpec

/** MMR diversification ([[Mmr]]): near-duplicates of an earlier pick are
  * demoted, relevance order is kept among dissimilar docs, and the
  * greedy loop is deterministic and k-bounded.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*): Array[Float] = xs.toArray

  test("a near-duplicate of the first pick is demoted below a dissimilar doc") {
    // rel order: 1 (best), 2 (its near-clone), 3 (dissimilar, lower rel)
    val cands = Seq(
      (1L, 0.99, vec(1f, 0f, 0f)),
      (2L, 0.98, vec(0.999f, 0.04f, 0f)), // ~same direction as 1
      (3L, 0.60, vec(0f, 1f, 0f))) // orthogonal
    val got = Mmr.select(cands, k = 3, lambda = 0.5)
    assert(got.map(_._2) == Seq(1L, 3L, 2L), s"got $got")
  }

  test("identical vectors: pure relevance order with id tie-break, penalty saturates") {
    val v = vec(1f, 1f)
    val cands = Seq((3L, 0.9, v), (1L, 0.9, v), (2L, 0.8, v))
    val got = Mmr.select(cands, k = 3, lambda = 0.5)
    assert(got.map(_._2) == Seq(1L, 3L, 2L))
    // after the first pick every remaining doc has max-sim 1.0
    assert(got(1)._3 == BigDecimal(0.5 * 0.9 - 0.5)
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("mmrTopK over a DataFrame is deterministic and k-bounded") {
    val emb = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat / 11f)))
      .toDF("vec_id", "embedding")
    val q = Seq.tabulate(8)(j => (j % 3).toFloat / 3f)
    val a = Mmr.mmrTopK(emb, "vec_id", "embedding", q, nCands = 20, k = 10)
      .as[(Int, Long, Double)].collect().toSeq
    val b = Mmr.mmrTopK(emb, "vec_id", "embedding", q, nCands = 20, k = 10)
      .as[(Int, Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.map(_._1) == (1 to 10))
    assert(a.map(_._2).distinct.size == 10)
    // k beyond the candidate pool stops at the pool
    val c = Mmr.mmrTopK(emb, "vec_id", "embedding", q, nCands = 5, k = 10)
      .as[(Int, Long, Double)].collect().toSeq
    assert(c.size == 5)
  }

  test("mmrTopKBatch ≡ per-query mmrTopK") {
    val emb = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat / 11f)))
      .toDF("vec_id", "embedding")
    val queries = (0 until 3).map(i =>
      (i + 1).toLong -> Seq.tabulate(8)(j => ((j + i) % 3).toFloat / 3f))
    val batch = Mmr.mmrTopKBatch(emb, "vec_id", "embedding", queries,
        nCands = 20, k = 10)
      .as[(Long, Int, Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)
        .map(r => (r._2, r._3, r._4))).toMap
    queries.foreach { case (qid, q) =>
      val single = Mmr.mmrTopK(emb, "vec_id", "embedding", q,
          nCands = 20, k = 10)
        .as[(Int, Long, Double)].collect().toSeq
      assert(batch(qid) == single, s"query $qid")
    }
  }
}
