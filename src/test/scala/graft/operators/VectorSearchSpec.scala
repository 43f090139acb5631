package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(rnd: scala.util.Random, d: Int): Array[Float] =
    Array.fill(d)(rnd.nextFloat() - 0.5f)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    if (na > 0 && nb > 0) d / (math.sqrt(na) * math.sqrt(nb)) else 0.0
  }

  private val rnd = new scala.util.Random(5)
  private val corpus = (1L to 100L).map(i => i -> randVec(rnd, 32))
  private val query = randVec(rnd, 32)

  test("bruteTopK matches a local exact scan") {
    val emb = corpus.toDF("vec_id", "embedding")
    val got = VectorSearch.bruteTopK(emb, "vec_id", "embedding", query.toSeq, 10)
      .select("doc_id").as[Long].collect().toSeq
    val want = corpus.map { case (id, v) => (id, cos(v, query)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    assert(got == want)
  }

  test("bruteTopKBatch returns per-query exact top-k") {
    val emb = corpus.toDF("vec_id", "embedding")
    val q2 = randVec(rnd, 32)
    val queries = Seq((1L, query), (2L, q2)).toDF("query_id", "qvec")
    val got = VectorSearch.bruteTopKBatch(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", 5)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    def want(q: Array[Float]) = corpus.map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(got(1L) == want(query))
    assert(got(2L) == want(q2))
  }

  test("TopKAggregator batch kNN == window-function batch kNN, with partial aggregation") {
    val emb = corpus.toDF("vec_id", "embedding")
    val q2 = randVec(rnd, 32)
    val queries = Seq((1L, query), (2L, q2)).toDF("query_id", "qvec")
    val viaAgg = VectorSearch.bruteTopKBatchAgg(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", 7)
      .select("query_id", "rank", "doc_id").as[(Long, Int, Long)].collect().toSet
    val viaWindow = VectorSearch.bruteTopKBatch(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", 7)
      .select("query_id", "rank", "doc_id").as[(Long, Int, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    // the plan must do partial (map-side) aggregation — only k rows per
    // partition reach the shuffle
    val plan = VectorSearch.bruteTopKBatchAgg(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", 7).queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkaggregator") ||
      plan.toLowerCase.contains("partial"), plan.take(1000))
  }

  test("IVF with all clusters probed is exact; fewer probes trade recall") {
    val emb = corpus.toDF("vec_id", "embedding")
    val index = VectorSearch.buildIvf(emb, "vec_id", "embedding", nCentroids = 4)
    assert(index.assigned.select("cluster_id").distinct().count() <= 4)
    val exact = VectorSearch.bruteTopK(emb, "vec_id", "embedding", query.toSeq, 10)
      .select("doc_id").as[Long].collect().toSet
    val allProbes = VectorSearch.ivfTopK(index, query.toSeq, 10, nprobe = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(allProbes == exact, "nprobe = ncentroids must equal exact search")
    val oneProbe = VectorSearch.ivfTopK(index, query.toSeq, 10, nprobe = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(oneProbe.size == 10)
    val recall = (oneProbe & exact).size.toDouble / 10
    assert(recall >= 0.3, s"1-probe recall $recall suspiciously low")
  }
}
