package graft.operators

import graft.SparkSpec

/** Phrase search ([[PhraseSearch]]): adjacent-start occurrence counting
  * (adjacent repeats AND true overlaps each count — the positional-index
  * semantics the stored tier shares), BM25 scoring against a
  * hand-computed value, and ranking determinism.
  */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def tfs(rows: Seq[(Long, String)], phrase: String): Map[Long, (Long, Long)] =
    PhraseSearch.phraseStats(rows.toDF("doc_id", "text"), "doc_id", "text", phrase)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("tf counts adjacent-start occurrences; adjacent repeats each count") {
    val m = tfs(Seq(
      (1L, "window join"),
      (2L, "window join window join"), // adjacent: both count
      (3L, "window join and window join again"),
      (4L, "window of join"), // not adjacent
      (5L, "the window joint"), // 'joint' is a different token
      (6L, "")), "window join")
    assert(m(1L) == (2L, 1L))
    assert(m(2L) == (4L, 2L), s"adjacent repeats: ${m(2L)}")
    assert(m(3L) == (6L, 2L))
    assert(m(4L) == (3L, 0L))
    assert(m(5L) == (3L, 0L))
    assert(m(6L) == (0L, 0L))
  }

  test("true overlaps each count (adjacent-start positional convention)") {
    val m = tfs(Seq((1L, "a a a"), (2L, "a a a a")), "a a")
    assert(m(1L)._2 == 2L) // starts 0 and 1
    assert(m(2L)._2 == 3L) // starts 0, 1 and 2
  }

  test("phrase tokenization ignores punctuation and case") {
    val m = tfs(Seq((1L, "Window, JOIN!")), "window join")
    assert(m(1L) == (2L, 1L))
  }

  test("BM25 phrase score matches the hand formula; ranking is (score desc, id)") {
    val docs = Seq(
      (1L, "window join extra words here"), // tf=1, dl=5
      (2L, "window join window join"), // tf=2, dl=4
      (3L, "nothing relevant at all"), // tf=0 -> no row
      (4L, "window join")) // tf=1, dl=2
      .toDF("doc_id", "text")
    val got = PhraseSearch.phraseTopK(docs, "doc_id", "text", "window join", 10)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(2L, 4L, 1L)) // tf=2 first, then shorter doc
    val n = 4.0; val df = 3.0
    val avgdl = (5 + 4 + 2 + 4) / 4.0
    def score(tf: Double, dl: Double): Double = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.toMap == Map(1L -> score(1, 5), 2L -> score(2, 4), 4L -> score(1, 2)),
      s"got $got")
  }
}
