package graft.operators

import graft.SparkSpec

/** TextRank ([[TextRank]]): co-occurrence graph construction, the exact
  * integer iteration against a driver-side twin, and ranking sanity
  * (hub words outrank leaves).
  */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("co-occurrence edges: adjacency window 2, undirected, weighted, no self-loops") {
    val docs = Seq((1L, "a b a"), (2L, "b b c")).toDF("doc_id", "text")
    val got = TextRank.cooccurrenceEdges(docs, "text")
      .as[(String, String, Long)].collect().toSet
    // doc1: (a,b),(b,a); doc2: (b,b) dropped, (b,c)
    assert(got == Set(
      ("a", "b", 2L), ("b", "a", 2L),
      ("b", "c", 1L), ("c", "b", 1L)), s"got $got")
  }

  /** Driver-side exact-integer PageRank twin. */
  private def driverRanks(edges: Set[(String, String, Long)],
                          iters: Int): Map[String, Long] = {
    val outw = edges.groupBy(_._1)
      .map { case (s, es) => s -> es.toSeq.map(_._3).sum }
    val nodes = edges.map(_._1)
    val n = nodes.size.toLong
    val base = (TextRank.Scale * 15L) / (n * 100L)
    var r = nodes.map(_ -> TextRank.Scale / n).toMap
    (1 to iters).foreach { _ =>
      val cs = edges.toSeq
        .map { case (s, d, w) => d -> (r(s) * w) / outw(s) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      r = nodes.map(v => v -> (base + (85L * cs.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("8 exact-integer rounds match the driver twin value for value") {
    val docs = Seq(
      (1L, "hub a hub b hub c"),
      (2L, "a b c d"),
      (3L, "hub d hub a")).toDF("doc_id", "text")
    val edges = TextRank.cooccurrenceEdges(docs, "text")
      .as[(String, String, Long)].collect().toSet
    val exp = driverRanks(edges, 8)
    val got = TextRank.keywords(docs, "text", k = 100, iters = 8)
      .as[(String, Long)].collect().toMap
    assert(got == exp, s"got $got, exp $exp")
    // the hub word co-occurs with everything — it must rank first
    assert(got.maxBy(_._2)._1 == "hub")
  }

  test("empty and single-token corpora produce no ranked rows") {
    val docs = Seq((1L, ""), (2L, "lonely")).toDF("doc_id", "text")
    assert(TextRank.keywords(docs, "text", k = 10).count() == 0L)
  }

  test("driver regime ≡ distributed loop, value for value (both vs the twin)") {
    // default keywordsFromEdges now iterates the vocab-bounded graph on
    // the driver; forcing driverEdgeLimit=0 keeps the distributed
    // join+groupBy rounds — identical ranks and identical (rank DESC,
    // word) head either way
    val docs = Seq(
      (1L, "spark join filter window spark"),
      (2L, "join window join scan"),
      (3L, "filter scan filter spark window")).toDF("doc_id", "text")
    val edges = TextRank.cooccurrenceEdges(docs, "text").localCheckpoint(true)
    val viaDriver = TextRank.keywordsFromEdges(edges, k = 100, iters = 8)
      .as[(String, Long)].collect().toSeq
    val viaSpark = TextRank.keywordsFromEdges(edges, k = 100, iters = 8,
        driverEdgeLimit = 0L)
      .as[(String, Long)].collect().toSeq
    assert(viaDriver == viaSpark, s"driver $viaDriver vs spark $viaSpark")
    val twin = driverRanks(
      edges.as[(String, String, Long)].collect().toSet, 8)
    assert(viaDriver.toMap == twin)
  }
}
