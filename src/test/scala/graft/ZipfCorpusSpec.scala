package graft

import org.apache.spark.sql.functions._

/** The r17 Zipf scale-corpus generator: the scale receipts' policy
  * decisions (batch pruning tiers, page-pruned stores, sorted layouts)
  * are only as meaningful as this corpus's geometry, so the generator
  * itself is pinned — determinism, length fidelity, and the Zipf shape.
  */
class ZipfCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val lengths = Array(10, 40, 54, 80, 100)

  test("deterministic: same inputs produce a bit-identical corpus") {
    val a = Scale.zipfCorpus(spark, 200L, lengths, vocab = 1000)
      .orderBy("doc_id").select("doc_id", "text").as[(Long, String)].collect()
    val b = Scale.zipfCorpus(spark, 200L, lengths, vocab = 1000)
      .orderBy("doc_id").select("doc_id", "text").as[(Long, String)].collect()
    assert(a.sameElements(b))
    // adjacent docs must not share draw structure (the splitmix scramble)
    assert(a(0)._2 != a(1)._2)
  }

  test("doc lengths follow the supplied multiset, cycled by doc_id") {
    val rows = Scale.zipfCorpus(spark, 10L, lengths, vocab = 1000)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().sortBy(_._1)
    rows.foreach { case (id, n) =>
      assert(n == lengths((id % lengths.length).toInt))
    }
  }

  test("token frequencies are Zipf-shaped: rank-1 dominates and the tail is long") {
    val freq = Scale.zipfCorpus(spark, 2000L, Array(60), vocab = 5000)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val total = freq.values.sum.toDouble
    // rank-1 share ~ 1/H(5000, 1.07) ≈ 0.15; require the right ballpark
    val p1 = freq.getOrElse("w1", 0L) / total
    assert(p1 > 0.08 && p1 < 0.25, s"rank-1 share $p1 not Zipf-plausible")
    // monotone-ish decay across decades of rank
    val p10 = freq.getOrElse("w10", 0L) / total
    val p100 = freq.getOrElse("w100", 0L) / total
    assert(p1 > p10 && p10 > p100, "frequency must decay with rank")
    // a LONG tail: far more distinct terms than any word-soup corpus
    assert(freq.size > 2000, s"only ${freq.size} distinct terms — tail too short")
  }

  test("tokens survive the engine's BM25 tokenizer unchanged") {
    val d = Scale.zipfCorpus(spark, 5L, Array(30), vocab = 100)
    val kept = d.select(explode(
        graft.functions.TextFunctions.tokenizeBm25(col("text"))).as("t"))
      .distinct().as[String].collect()
    assert(kept.nonEmpty && kept.forall(_.matches("w\\d+")))
    // round-trip: every generated token is kept (none stopworded/dropped)
    val raw = d.select(explode(split(col("text"), " ")).as("t"))
      .distinct().as[String].collect().toSet
    assert(kept.toSet == raw)
  }
}
