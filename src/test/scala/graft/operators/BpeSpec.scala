package graft.operators

import graft.SparkSpec

/** BPE tokenizer training ([[Bpe.learnMerges]]): hand-checkable merge
  * sequences on tiny corpora, the deterministic lexicographic tie-break,
  * and the driver-side applyMerges twin reconstructing whole words.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge order on a hand-checkable corpus, with the lexicographic tie-break") {
    // one word "aaab" × 3: round 1 counts (a,a)=6 > (a,b)=3 → merge (a,a)
    // round 2 ties (aa,a)=3 with (a,b)=3 → lexicographic: (a,b) wins
    // round 3: only (aa,ab)=3 remains
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, "text", numMerges = 5)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 3L)), s"got $got")
  }

  test("in-process merge loop ≡ distributed loop (rank, pair, merged, count)") {
    // mixed corpus: tie-breaks, repeated-run merges, and multi-round
    // interactions all in play; inProcessLimit = 0 forces the distributed
    // loop, the default takes the driver rung — rows must match exactly
    val docs = Seq((1L, "aaab aaab banana band"), (2L, "aaab banana abba"),
      (3L, "cab cab cab band bandana")).toDF("doc_id", "text")
    val fast = Bpe.learnMerges(docs, "text", numMerges = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val dist = Bpe.learnMerges(docs, "text", numMerges = 6,
        inProcessLimit = 0)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(fast == dist, s"fast $fast vs dist $dist")
  }

  test("applyMerges reconstructs a fully merged word and leaves foreign words split") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    assert(Bpe.applyMerges("aaab", merges) == Seq("aaab"))
    assert(Bpe.applyMerges("aab", merges) == Seq("aa", "b"))
    assert(Bpe.applyMerges("xy", merges) == Seq("x", "y"))
  }

  test("immediately adjacent occurrences all merge in one pass: 'abab' becomes [ab, ab]") {
    // the single-space-join regression: ' a b a b ' under replace(' a b ',
    // ' ab ') consumes the shared boundary space and skips every second
    // occurrence ([ab, a, b]); the double-space join gives each symbol its
    // own flanking spaces so BOTH occurrences merge
    assert(Bpe.applyMerges("abab", Seq(("a", "b"))) == Seq("ab", "ab"))
    assert(Bpe.applyMerges("ababab", Seq(("a", "b"))) == Seq("ab", "ab", "ab"))
    assert(Bpe.applyMerges("papa", Seq(("p", "a"))) == Seq("pa", "pa"))
    // Spark-side encode agrees: one word "abab" has n_tokens 2, not 3
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", Seq(("a", "b")))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 2L, 2.0)), s"got $got")
    // and the trainer cannot re-select a pair it already learned: "abab"
    // round 1 merges (a,b) everywhere, so round 2 sees only (ab,ab)
    val merges = Bpe.learnMerges(Seq((1L, "abab abab")).toDF("doc_id", "text"),
      "text", numMerges = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "a", "b", "ab", 4L),
      (2, "ab", "ab", "abab", 2L)), s"got $merges")
  }

  test("left-to-right non-overlapping merge convention: 'aaa' becomes [aa, a]") {
    val docs = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 1)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(merges == Seq((1, "a", "a", "aa", 6L)), s"got $merges")
    assert(Bpe.applyMerges("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
  }

  test("encode matches the driver-side applyMerges twin word for word") {
    val docs = Seq(
      (1L, "aaab aab xy"),
      (2L, "aaab aaab"),
      (3L, ""), // tokenless doc keeps its row with zeros
      (4L, "zz aab")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    def n(ws: String*): (Long, Long) = {
      val words = ws.filter(_.nonEmpty)
      (words.size.toLong,
        words.map(w => Bpe.applyMerges(w, merges).size.toLong).sum)
    }
    val exp = Seq(
      (1L, n("aaab", "aab", "xy")),
      (2L, n("aaab", "aaab")),
      (3L, (0L, 0L)),
      (4L, n("zz", "aab"))).map { case (id, (nw, nt)) =>
      (id, nw, nt,
        if (nw == 0) 0.0
        else BigDecimal(nt.toDouble / nw)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == exp, s"got $got, expected $exp")
  }

  test("encode under trained merges: fertility never exceeds the char-split fertility") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox the the")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
      .map(m => (m._2, m._3))
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    got.foreach { case (_, nw, nt, fert) =>
      assert(nw > 0 && nt >= nw, s"tokens can never undercut words: $got")
      assert(fert >= 1.0, s"fertility below 1: $got")
    }
    // "the" merges to one symbol (it dominates the pair counts), so doc 2's
    // fertility must be strictly below plain char-count fertility
    val charFert = "the quick brown fox the the".split(" ")
      .map(_.length).sum.toDouble / 6
    assert(got(1)._4 < charFert)
  }

  test("merges reduce corpus fertility (symbols per word never increase)") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
      .map(m => (m._2, m._3))
    assert(merges.size == 6)
    val words = Seq("the", "quick", "brown", "fox")
    words.foreach { w =>
      assert(Bpe.applyMerges(w, merges).size <= w.length)
    }
    // "the" appears 3x and is 3 chars: its pairs dominate, so it must
    // merge to fewer symbols than characters
    assert(Bpe.applyMerges("the", merges).size < 3)
  }
}
