package graft.operators

import graft.SparkSpec

/** Central-chunk selection ([[Summarize]]): the consensus chunk wins,
  * single-chunk groups score zero centrality, unembedded chunks are
  * excluded, ties break by id.
  */
class SummarizeSpec extends SparkSpec {
  import spark.implicits._

  test("the chunk closest to its siblings wins; outliers lose") {
    val docs = Seq(
      (1L, "sA"), (2L, "sA"), (3L, "sA"), // 1,2 aligned; 3 orthogonal
      (10L, "sB")) // single-chunk group
      .toDF("doc_id", "source")
    val emb = Seq(
      (1L, Array(1f, 0f, 0.1f)),
      (2L, Array(1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f)),
      (10L, Array(1f, 1f, 1f))).toDF("vec_id", "embedding")
    val got = Summarize.centralChunks(docs, emb,
        "source", "doc_id", "vec_id", "embedding")
      .as[(String, Long, Long, Double)].collect().toSeq
    // docs 1 and 2 tie exactly (cos(1,2) each, zero toward the
    // orthogonal doc 3) -> the lower id wins; doc 3 loses with 0.0
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("sA", 1L, 3L), ("sB", 10L, 1L)), s"got $got")
    assert(got(1)._4 == 0.0) // no sibling -> zero centrality
    // cross-check the winner against a driver recomputation
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na * nb > 0) d / (na * nb) else 0.0
    }
    val e = Map(1L -> Array(1f, 0f, 0.1f), 2L -> Array(1f, 0f, 0f),
      3L -> Array(0f, 1f, 0f))
    val cents = Seq(1L, 2L, 3L).map(i =>
      i -> e.keys.filter(_ != i).map(j => cos(e(i), e(j))).sum).toMap
    assert(cents.maxBy { case (i, c) => (c, -i) }._1 == got.head._2)
  }

  test("unembedded chunks are excluded from the group and its count") {
    val docs = Seq((1L, "s"), (2L, "s"), (3L, "s")).toDF("doc_id", "source")
    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)))
      .toDF("vec_id", "embedding") // doc 3 unembedded
    val got = Summarize.centralChunks(docs, emb,
        "source", "doc_id", "vec_id", "embedding")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("s", 1L, 2L, 1.0))) // tie on centrality -> lower id
  }
}
