package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private val vec = Seq((10L, 0.9), (11L, 0.8), (12L, 0.7)).toDF("doc_id", "score")
  private val kw = Seq((11L, 5.0), (13L, 4.0), (10L, 3.0)).toDF("doc_id", "score")

  test("RRF: score(d) = sum over lists of 1/(60 + rank)") {
    val got = Fusion.rrf(Seq(vec, kw))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // vec ranks: 10->1, 11->2, 12->3 ; kw ranks: 11->1, 13->2, 10->3
    def r(k: Int) = 1.0 / (60 + k)
    assert(math.abs(got(10L) - (r(1) + r(3))) < 1e-12)
    assert(math.abs(got(11L) - (r(2) + r(1))) < 1e-12)
    assert(math.abs(got(12L) - r(3)) < 1e-12)
    assert(math.abs(got(13L) - r(2)) < 1e-12)
  }

  test("RRF is invariant to input row order (rank depends only on scores)") {
    val shuffled = vec.orderBy(rand(1))
    val a = Fusion.rrf(Seq(vec, kw)).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = Fusion.rrf(Seq(shuffled, kw)).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b)
  }

  test("weighted fusion: max-normalized, missing scores are 0") {
    val got = Fusion.weighted(vec, kw, vectorWeight = 0.7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // vec max 0.9; kw max 5.0
    assert(math.abs(got(10L) - (0.7 * (0.9 / 0.9) + 0.3 * (3.0 / 5.0))) < 1e-12)
    assert(math.abs(got(12L) - (0.7 * (0.7 / 0.9) + 0.3 * 0.0)) < 1e-12)
    assert(math.abs(got(13L) - (0.0 + 0.3 * (4.0 / 5.0))) < 1e-12)
  }

  test("weighted fusion normalizes independent weights like the reference") {
    // vector_weight=0.5, bm25_weight=0.3 -> effective 0.625 / 0.375
    // (/root/reference/query/search.py:350-411 normalizes by the sum)
    val got = Fusion.weighted(vec, kw, vectorWeight = 0.5, bm25Weight = 0.3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vw = 0.5 / 0.8
    val bw = 0.3 / 0.8
    assert(math.abs(got(10L) - (vw * 1.0 + bw * (3.0 / 5.0))) < 1e-12)
    assert(math.abs(got(13L) - (bw * (4.0 / 5.0))) < 1e-12)
  }

  test("weightedBatch equals per-query weighted fusion") {
    val rnd = new scala.util.Random(3)
    def mk = (for (q <- 0 until 3; d <- 0 until 8 if rnd.nextBoolean())
      yield (q.toLong, d.toLong, rnd.nextDouble() * 10)).toDF("query_id", "doc_id", "score")
    val vec = mk; val kw = mk
    val batch = Fusion.weightedBatch(vec, kw, 0.6, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    (0 until 3).foreach { q =>
      val single = Fusion.weighted(
          vec.filter(col("query_id") === q).drop("query_id"),
          kw.filter(col("query_id") === q).drop("query_id"), 0.6, 0.4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(single.keySet == batch.keySet.filter(_._1 == q).map(_._2))
      single.foreach { case (d, s) =>
        assert(math.abs(batch((q.toLong, d)) - s) < 1e-12, s"q$q doc$d")
      }
    }
  }
}
