package graft.operators

import graft.SparkSpec

class LmQualitySpec extends SparkSpec {
  import spark.implicits._

  test("score: hand-computed cross-entropy with OOV backoff to the 1/total floor") {
    // counts: the=4, cat=1, dog=1; total=6; vocabSize=2 keeps {the, cat}
    // (count desc, token asc — cat beats dog on the tie)
    val docs = Seq(
      (1L, "the the the cat"),
      (2L, "the dog")).toDF("doc_id", "text")
    val got = LmQuality.score(docs, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val costThe = math.floor(-math.log(4.0 / 6.0) * 1e6).toLong // 405465
    val costCat = math.floor(-math.log(1.0 / 6.0) * 1e6).toLong // 1791759
    val costOov = math.floor(math.log(6.0) * 1e6).toLong        // 1791759
    def ce(s: Long, n: Long): Double =
      BigDecimal((s.toDouble / n.toDouble) / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((4L, ce(3 * costThe + costCat, 4))), s"got $got")
    assert(got(2L) == ((2L, ce(costThe + costOov, 2))), s"got $got")
  }

  test("score: rare-token documents score strictly higher than common-token documents") {
    val docs = Seq(
      (1L, "alpha alpha alpha alpha alpha alpha alpha alpha"),
      (2L, "alpha alpha alpha alpha alpha alpha beta gamma"),
      (3L, "zeta eta theta iota kappa lambda mu nu")).toDF("doc_id", "text")
    val ce = LmQuality.score(docs, "doc_id", "text", vocabSize = 100)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(ce(1L) < ce(2L) && ce(2L) < ce(3L), s"got $ce")
  }

  test("ccnetBuckets: value-thresholded thirds, boundary ties fall on the better side") {
    // 9 docs with strictly increasing rarity → clean thirds
    val base = Seq(
      (1L, "a a a a"), (2L, "a a a b"), (3L, "a a b b"),
      (4L, "a b b c"), (5L, "b b c c"), (6L, "b c c d"),
      (7L, "c c d d"), (8L, "c d d e"), (9L, "d e e f")).toDF("doc_id", "text")
    val got = LmQuality.ccnetBuckets(base, "doc_id", "text", vocabSize = 100)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    // every bucket non-empty and ordered: head docs have lower CE than tail docs
    assert(sizes.keySet == Set("head", "middle", "tail"), s"got $sizes")
    val ce = LmQuality.score(base, "doc_id", "text", vocabSize = 100)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val maxHead = got.collect { case (d, "head") => ce(d) }.max
    val minTail = got.collect { case (d, "tail") => ce(d) }.min
    assert(maxHead < minTail, s"head must outrank tail: $got / $ce")
    // ties at the cut: identical docs share a CE value — all land in head
    val tied = Seq(
      (1L, "a a"), (2L, "a a"), (3L, "a a"), (4L, "a a"),
      (5L, "b c"), (6L, "c d")).toDF("doc_id", "text")
    val tiedGot = LmQuality.ccnetBuckets(tied, "doc_id", "text", vocabSize = 100)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(tiedGot(_) == "head"),
      s"boundary-tied docs must all take the better bucket: $tiedGot")
  }

  test("vocabCosts: truncates to the top-V by (count desc, token asc)") {
    val docs = Seq((1L, "b b b a a c")).toDF("doc_id", "text")
    val voc = LmQuality.vocabCosts(docs, "text", vocabSize = 2)
      .select("token").as[String].collect().toSet
    assert(voc == Set("b", "a"), s"got $voc")
  }
}
