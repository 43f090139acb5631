package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("packTokenBins: concat-and-chunk per shard, integer offsets") {
    import spark.implicits._
    // shard a: token counts 300, 300, 500 → cum-starts 0, 300, 600
    //   budget 512 → bins 0, 0, 1; offsets 0, 300, 88
    // shard b: 600, 10 → bins 0, 1; offsets 0, 88
    val docs = Seq(
      ("a", 1L, 300), ("a", 2L, 300), ("a", 3L, 500),
      ("b", 4L, 600), ("b", 5L, 10))
      .toDF("source", "doc_id", "cnt")
    val out = Curation.packTokenBins(docs, "source", "doc_id", col("cnt"), 512)
      .select("doc_id", "bin_id", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L),
      (4L, 0L, 0L), (5L, 1L, 88L)))
  }

  test("packTokenBins invariants over a seeded corpus grid (property sweep)") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (budget <- Seq(64, 128, 512)) {
      val docs = (1 to 200).map { i =>
        (s"shard${rng.nextInt(5)}", i.toLong, rng.nextInt(200))
      }.toDF("source", "doc_id", "cnt")
      val out = Curation.packTokenBins(docs, "source", "doc_id", col("cnt"), budget)
        .select("source", "doc_id", "n_tok", "bin_id", "bin_offset")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // re-derive the concat-and-chunk closed form sequentially per shard:
      // bin = cum/budget and offset = cum%budget at each chunk's first token
      out.groupBy(_._1).foreach { case (_, rows) =>
        var cum = 0L
        rows.sortBy(_._2).foreach { case (_, _, n, bin, off) =>
          assert(bin == cum / budget && off == cum % budget)
          cum += n
        }
      }
      assert(out.forall(r => r._5 >= 0 && r._5 < budget))
    }
  }

  test("packTokenBins: a chunk landing exactly on the budget starts the next bin") {
    import spark.implicits._
    val docs = Seq(("a", 1L, 512), ("a", 2L, 1)).toDF("source", "doc_id", "cnt")
    val out = Curation.packTokenBins(docs, "source", "doc_id", col("cnt"), 512)
      .select("doc_id", "bin_id", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 0L, 0L), (2L, 1L, 0L)))
  }

  test("contamination: exact leak flags at ratio 1.0, partial overlap graded, disjoint absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),  // exact leak of bench 10
      (2L, "alpha beta gamma other words here no"), // shares 1 of its 5 trigrams
      (3L, "entirely different vocabulary rows"))
      .toDF("doc_id", "text")
    val bench = Seq((10L, "alpha beta gamma delta epsilon zeta"))
      .toDF("bench_id", "text")
    val out = Curation.contamination(docs, "doc_id", "text", bench, "bench_id",
        "text", n = 3, threshold = 0.8)
      .select("doc_id", "overlap", "ratio", "contaminated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0) == (1L, 4L, 1.0, true))
    assert(out(1)._2 == 1L && out(1)._3 == 0.2 && !out(1)._4)
  }

  test("contamination rejects identical id column names with a clear message") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Curation.contamination(docs, "doc_id", "text", docs, "doc_id",
        "text", n = 3, threshold = 0.8)
    }
    assert(err.getMessage.contains("distinct"))
  }

  test("plan shapes: packing windows are shard-partitioned; contamination broadcasts the benchmark side") {
    import spark.implicits._
    val docs = (1 to 100).map(i => (s"s${i % 4}", i.toLong, "alpha beta gamma delta"))
      .toDF("source", "doc_id", "text")
    val packed = Curation.packTokenBins(docs, "source", "doc_id", lit(5), 512)
    val windows = packed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
    }
    assert(windows.nonEmpty && windows.forall(_.nonEmpty),
      "packing must never run a global (partition-less) window")
    val bench = docs.filter(col("doc_id") <= 2)
      .select(col("doc_id").as("bench_id"), col("text"))
    val plan = Curation.contamination(docs, "doc_id", "text", bench, "bench_id",
        "text", n = 3, threshold = 0.8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      "benchmark side must broadcast")
    assert(!plan.contains("CartesianProduct"), "no all-pairs path")
  }

  test("repetitionRatio: repeats score high, unique text scores 0, short text 0") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val out = Seq(
      (1, Seq.fill(10)("buy cheap stuff now").mkString(" ")), // boilerplate
      (2, "every word here is fully unique today"),
      (3, "ab"))
      .toDF("id", "txt")
      .select(col("id"),
        round(TextFunctions.repetitionRatio(col("txt"), 3), 4).as("r3"))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getDouble(1)))
    // 40 tokens → 38 trigrams; 4-periodic phrase → 4 distinct → 1 - 4/38
    assert(out(0)._2 == 0.8947)
    assert(out(1)._2 == 0.0)
    assert(out(2)._2 == 0.0)
  }

  test("scrubPii: staged redaction with stage-wise counts") {
    import spark.implicits._
    val (scrubbed, counts) = Curation.scrubPii(col("txt"))
    val rows = Seq(
      (1, "Contact john.doe@example.com or call (555) 123-4567 now"),
      (2, "SSN 123-45-6789 card 4111-1111-1111-1111 server 10.0.0.1"),
      (3, "no pii at all here"))
      .toDF("id", "txt")
      .select(col("id") +: scrubbed.as("scrubbed") +:
        counts.map { case (n, c) => c.as(s"n_$n") }: _*)
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "Contact [EMAIL] or call [PHONE] now")
    assert(rows(0).getInt(2) == 1 && rows(0).getInt(4) == 1) // n_email, n_phone
    // card counted as card (not as phone fragments), ssn and ip intact
    assert(rows(1).getString(1) == "SSN [SSN] card [CARD] server [IP]")
    assert(rows(1).getInt(3) == 1 && rows(1).getInt(4) == 0 &&
      rows(1).getInt(5) == 1 && rows(1).getInt(6) == 1)
    assert(rows(2).getString(1) == "no pii at all here" &&
      (2 to 6).forall(rows(2).getInt(_) == 0))
  }

  test("curationDecision: first failing rule wins; keepers survive every rule") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog and runs far away today"
    val docs = Seq(
      (1L, common),                                              // healthy → keep
      (2L, "too short"),                                         // length
      // long enough but one phrase repeated → repetition fires BEFORE
      // quality even though its stopword-free text also fails quality
      (3L, Seq.fill(10)("zz yy xx").mkString(" ")),
      // no stopwords, low alpha ratio (digit soup with punctuation) but
      // no repeated 3-gram → quality
      (4L, (1 to 30).map(i => s"${i}#${i * 7}!").mkString(" ")),
      (5L, ""))                                                  // empty → length
      .toDF("doc_id", "text")
    val got = Curation.curationDecision(docs, "doc_id", "text",
        minTokens = 5, maxRep3 = 0.1, minQuality = 0.75,
        maxCrossEntropy = 100.0, vocabSize = 5)
      .select("doc_id", "reason", "keep").as[(Long, String, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> (("keep", 1)), 2L -> (("length", 0)), 3L -> (("repetition", 0)),
      4L -> (("quality", 0)), 5L -> (("length", 0))), s"got $got")
    // the perplexity rung: same corpus, CE ceiling forced to 0 — every doc
    // surviving rules 1-3 must now fail with 'perplexity'
    val strict = Curation.curationDecision(docs, "doc_id", "text",
        minTokens = 5, maxRep3 = 0.1, minQuality = 0.75,
        maxCrossEntropy = 0.0, vocabSize = 5)
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(strict(1L) == "perplexity" && strict(3L) == "repetition",
      s"got $strict")
  }
}
