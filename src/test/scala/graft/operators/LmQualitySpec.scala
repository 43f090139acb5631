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

  test("vocabCosts: truncates to the top-V by (count desc, token asc)") {
    val docs = Seq((1L, "b b b a a c")).toDF("doc_id", "text")
    val voc = LmQuality.vocabCosts(docs, "text", vocabSize = 2)
      .select("token").as[String].collect().toSet
    assert(voc == Set("b", "a"), s"got $voc")
  }
}
