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

  test("scoreBigram: naive Stupid-Backoff reimplementation matches doc for doc") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "the dog sat on the cat"),
      (4L, "zebra"),                 // 1-token doc: unigram rate only
      (5L, null.asInstanceOf[String]),
      (6L, "")).toDF("doc_id", "text")
    val V = 4; val B = 3             // tiny heads force OOV + backoff paths
    def toks(t: String) = if (t == null) Seq.empty[String]
      else t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val all = docs.collect().map(r =>
      r.getLong(0) -> toks(if (r.isNullAt(1)) null else r.getString(1))).toMap
    val cnt = all.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = cnt.values.sum
    val uniHead = cnt.toSeq.sortBy { case (w, c) => (-c, w) }.take(V).toMap
    def cu(w: String) =
      if (uniHead.contains(w))
        math.floor(-math.log(cnt(w).toDouble / total.toDouble) * 1e6).toLong
      else math.floor(-math.log(1.0 / total.toDouble) * 1e6).toLong
    def cb(w: String) =
      if (uniHead.contains(w))
        math.floor(-math.log(0.4 * (cnt(w).toDouble / total.toDouble)) * 1e6).toLong
      else math.floor(-math.log(0.4 * (1.0 / total.toDouble)) * 1e6).toLong
    val bgCnt = all.values.filter(_.size >= 2)
      .flatMap(t => t.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bgHead = bgCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(B).toMap
    def pairCost(p: String) =
      if (bgHead.contains(p)) {
        val w1 = p.split(" ")(0)
        math.floor(-math.log(bgCnt(p).toDouble / cnt(w1).toDouble) * 1e6).toLong
      } else cb(p.split(" ")(1))
    val expected = all.map { case (id, t) =>
      val cost =
        if (t.isEmpty) 0L
        else cu(t.head) + t.sliding(2).filter(_.size == 2)
          .map(p => pairCost(p.mkString(" "))).sum
      id -> (t.size.toLong, cost)
    }
    val got = LmQuality.scoreBigram(docs, "doc_id", "text", V, B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"got $got expected $expected")
    // lockstep: the broadcast-join plan (entry budget 0 forces it) equals
    // the in-process codegen walk row for row
    val distributed = LmQuality.scoreBigram(docs, "doc_id", "text", V, B,
        inProcessEntries = 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(distributed == got, s"distributed $distributed != in-process $got")
    // repeated common bigrams must cost less per token than scrambled text
    val n1 = got(1L); val n3 = got(3L)
    assert(n1._2 > 0 && n3._2 > 0)
  }

  test("scoreBigram lockstep sweep: 10 seeded random corpora, in-process == distributed") {
    val rnd = new scala.util.Random(811L)
    val vocab = Vector("the", "cat", "sat", "mat", "dog", "ran", "fast",
      "zebra", "qux", "on", "a", "big")
    (1 to 10).foreach { trial =>
      val docs = (0 until 15).map { i =>
        val n = rnd.nextInt(9)
        (i.toLong, if (n == 0 && i % 4 == 0) null
          else Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val v = 1 + rnd.nextInt(6); val b = 1 + rnd.nextInt(6)
      val inProc = LmQuality.scoreBigram(docs, "doc_id", "text", v, b)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val dist = LmQuality.scoreBigram(docs, "doc_id", "text", v, b,
          inProcessEntries = 0)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(inProc == dist, s"trial $trial (V=$v B=$b): $inProc != $dist")
    }
  }
}
