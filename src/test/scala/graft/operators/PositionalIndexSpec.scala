package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** Positional index ([[PositionalIndex]]): stored serving ≡ the computed
  * [[PhraseSearch]] tier on EVERY phrase — repeated-token ones included
  * (both count adjacent starts, overlaps allowed) — plus write/read
  * round-trip and bucket pruning correctness.
  */
class PositionalIndexSpec extends SparkSpec {
  import spark.implicits._

  test("stored phraseTopK == PhraseSearch.phraseTopK on a distinct-token phrase") {
    val docs = (1L to 40L).map { i =>
      (i, if (i % 4 == 0) s"window join here pad${i} pad pad"
          else if (i % 4 == 1) "window of join not adjacent"
          else if (i % 4 == 2) "window join window join dense"
          else "nothing at all relevant")
    }.toDF("doc_id", "text")
    val computed = PhraseSearch.phraseTopK(docs, "doc_id", "text",
        "window join", 50)
      .as[(Long, Double)].collect().toSeq
    val ix = PositionalIndex.build(docs, "doc_id", "text")
    val stored = PositionalIndex.phraseTopK(ix, "window join", 50)
      .as[(Long, Double)].collect().toSeq
    assert(stored == computed, s"stored $stored vs computed $computed")
    assert(stored.nonEmpty)
  }

  test("repeated-token phrase: BOTH tiers count adjacent starts (overlaps included)") {
    val docs = Seq((1L, "a a a")).toDF("doc_id", "text")
    val ix = PositionalIndex.build(docs, "doc_id", "text")
    val pos = PositionalIndex.phraseStats(ix, Seq("a", "a"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(pos == Seq((1L, 2L, 3L)), s"positional: $pos") // starts 0 and 1
    val comp = PhraseSearch.phraseStats(docs, "doc_id", "text", "a a")
      .as[(Long, Long, Long)].collect().toSeq
    assert(comp == Seq((1L, 3L, 2L)), s"computed: $comp") // same two starts
  }

  test("stored phraseTopK == PhraseSearch.phraseTopK on a repeated-token phrase") {
    val docs = (1L to 30L).map { i =>
      (i, if (i % 3 == 0) s"vector vector vector pad$i"
          else if (i % 3 == 1) "vector vector once here"
          else "vector alone no pair")
    }.toDF("doc_id", "text")
    val computed = PhraseSearch.phraseTopK(docs, "doc_id", "text",
        "vector vector", 50)
      .as[(Long, Double)].collect().toSeq
    val ix = PositionalIndex.build(docs, "doc_id", "text")
    val stored = PositionalIndex.phraseTopK(ix, "vector vector", 50)
      .as[(Long, Double)].collect().toSeq
    assert(stored == computed, s"stored $stored vs computed $computed")
    assert(stored.nonEmpty)
    // the overlap case is actually exercised: tf 2 in the triple-run docs
    val st = PhraseSearch.phraseStats(docs, "doc_id", "text", "vector vector")
      .filter("doc_id % 3 = 0")
      .as[(Long, Long, Long)].collect()
    assert(st.forall(_._3 == 2L), s"expected overlapping tf 2: ${st.toSeq}")
  }

  test("phraseTopKBatch ≡ per-query phraseTopK (repeated-token and no-hit phrases included)") {
    val docs = (1L to 40L).map { i =>
      (i, if (i % 4 == 0) s"window join here pad$i window join"
          else if (i % 4 == 1) "vector vector vector run"
          else if (i % 4 == 2) "window join window join dense"
          else "nothing at all relevant")
    }.toDF("doc_id", "text")
    val ix = PositionalIndex.build(docs, "doc_id", "text")
    val queries = Seq(1L -> "window join", 2L -> "vector vector",
      3L -> "join window", 4L -> "absent phrase")
    val batch = PositionalIndex.phraseTopKBatch(ix, queries, 10)
      .as[(Long, Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(
        _.map(r => (r._2, r._3)).sortBy(r => (-r._2, r._1))).toMap
    queries.foreach { case (qid, q) =>
      val single = PositionalIndex.phraseTopK(ix, q, 10)
        .as[(Long, Double)].collect().toSeq.sortBy(r => (-r._2, r._1))
      assert(batch.getOrElse(qid, Nil) == single, s"query $qid '$q'")
    }
    assert(batch.contains(1L) && !batch.contains(4L)) // no-hit stays empty
  }

  test("requirement-join batch tf == naive driver adjacent-start count over 40 random phrases") {
    val vocab = Vector("a", "b", "c")
    val rnd = new scala.util.Random(11)
    val docs = (1L to 30L).map { i =>
      (i, Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val texts = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val ix = PositionalIndex.build(docs.toDF("doc_id", "text"), "doc_id", "text")
    def naiveTf(toks: Seq[String], doc: Seq[String]): Int =
      (0 to doc.size - toks.size).count(s =>
        toks.indices.forall(j => doc(s + j) == toks(j)))
    val batch = (1L to 40L).map { q =>
      q -> Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ") // repeats likely with a 3-token vocab
    }
    // k > corpus so no top-k cut interferes; compare the MATCH SETS (docs
    // with tf > 0) — the score is a deterministic function of (tf, dl,
    // df) already pinned by the other specs
    val got = PositionalIndex.phraseTopKBatch(ix, batch, 50)
      .select("query_id", "doc_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    batch.foreach { case (qid, phrase) =>
      val toks = phrase.split(" ").toSeq
      val expect = texts.collect {
        case (id, doc) if naiveTf(toks, doc) > 0 => id
      }.toSet
      assert(got.getOrElse(qid, Set.empty) == expect, s"query $qid '$phrase'")
    }
  }

  test("write/read round-trip serves identically and prunes to the phrase buckets") {
    val docs = (1L to 30L).map(i =>
      (i, s"alpha beta w$i gamma alpha beta")).toDF("doc_id", "text")
    val ix = PositionalIndex.build(docs, "doc_id", "text")
    val dir = Files.createTempDirectory("graft_posix_spec").toString
    PositionalIndex.write(ix, dir)
    val rt = PositionalIndex.read(spark, dir)
    val a = PositionalIndex.phraseTopK(ix, "alpha beta", 30)
      .as[(Long, Double)].collect().toSeq
    val b = PositionalIndex.phraseTopK(rt, "alpha beta", 30)
      .as[(Long, Double)].collect().toSeq
    assert(a == b && a.size == 30)
    // tf 2 per doc (both occurrences), and the at-rest scan carries the
    // partition column used for pruning
    val st = PositionalIndex.phraseStats(rt, Seq("alpha", "beta"))
      .as[(Long, Long, Long)].collect()
    assert(st.forall(_._2 == 2L))
    assert(rt.postings.columns.contains("term_bucket"))
  }

  test("relayout migrates an unsorted store in place, serving value-identically") {
    // a store pinned to the OLD unsorted layout (the pre-r17 default) —
    // simulating a pre-layout-record store by dropping the layout field
    val docs = (1L to 40L).map(i =>
      (i, s"alpha beta w$i gamma alpha beta delta w${i % 7}"))
      .toDF("doc_id", "text")
    val ix = PositionalIndex.build(docs, "doc_id", "text")
    val dir = Files.createTempDirectory("graft_posix_relayout").toString
    PositionalIndex.write(ix, dir, termSorted = Some(false))
    // strip the layout field so the store reads exactly like a pre-r18 one
    val legacyStats = spark.read.parquet(s"$dir/stats").drop("layout")
      .localCheckpoint(true)
    legacyStats.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    val legacy = PositionalIndex.read(spark, dir)
    assert(legacy.layout.isEmpty)
    val before = PositionalIndex.phraseTopK(legacy, "alpha beta", 40)
      .as[(Long, Double)].collect().toSeq
    // capture the pre-migration facts NOW: the relayout replaces the
    // files under this store, so `legacy`'s plans must not run after it
    val (beforeN, beforeAvgdl) = (legacy.corpusSize, legacy.avgdl)
    val beforeRows = legacy.postings.count()
    // migrate to the sorted layout; stats values and served rows unchanged
    assert(PositionalIndex.relayout(spark, dir, termSorted = Some(true)))
    val migrated = PositionalIndex.read(spark, dir)
    assert(migrated.layout.contains("sorted"))
    assert(migrated.corpusSize == beforeN && migrated.avgdl == beforeAvgdl)
    val after = PositionalIndex.phraseTopK(migrated, "alpha beta", 40)
      .as[(Long, Double)].collect().toSeq
    assert(after == before)
    // postings row set preserved exactly (order is the only change)
    assert(migrated.postings.count() == beforeRows)
    // idempotent: a second relayout to the same target is a no-op...
    assert(!PositionalIndex.relayout(spark, dir, termSorted = Some(true)))
    // ...and the auto rule can flip it back (tiny vocab -> unsorted)
    assert(PositionalIndex.relayout(spark, dir))
    assert(PositionalIndex.read(spark, dir).layout.contains("unsorted"))
    val back = PositionalIndex.phraseTopK(PositionalIndex.read(spark, dir),
      "alpha beta", 40).as[(Long, Double)].collect().toSeq
    assert(back == before)
  }
}
