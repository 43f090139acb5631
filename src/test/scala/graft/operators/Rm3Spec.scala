package graft.operators

import graft.SparkSpec

/** RM3 pseudo-relevance feedback ([[Rm3]]): expansion recalls documents
  * that share no query term, the no-expansion fallback degrades to plain
  * BM25, and interpolation keeps original-term evidence ranked.
  */
class Rm3Spec extends SparkSpec {
  import spark.implicits._

  private def index(rows: Seq[(Long, String)]): Bm25.Index =
    Bm25.buildIndex(rows.toDF("doc_id", "text"), "doc_id", "text")

  test("expansion recalls a doc sharing NO query term with the query") {
    // "quantum" docs co-occur with "entangled"; doc 50 has only
    // "entangled" — invisible to plain BM25, recalled by RM3
    val docs = (1L to 20L).map(i => (i, "quantum entangled physics notes")) ++
      Seq((50L, "entangled states only here"),
        (60L, "football match report"))
    val ix = index(docs)
    val plain = Bm25.topK(
      Bm25.scoreWithIndex(ix, spark, "quantum")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.col("score"), 4).as("score")), 50)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(!plain.contains(50L))
    val rm3 = Rm3.rm3TopK(ix, spark, "quantum", 50)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(rm3.contains(50L), s"RM3 should recall doc 50: $rm3")
    assert(!rm3.contains(60L), "unrelated doc must stay out")
  }

  test("no expansion terms available -> plain rounded BM25 ranking") {
    // every feedback doc contains ONLY the query term, so the expansion
    // mine (query terms excluded) is empty
    val docs = (1L to 5L).map(i => (i, ("quantum " * i.toInt).trim))
    val ix = index(docs)
    val rm3 = Rm3.rm3TopK(ix, spark, "quantum", 10)
      .as[(Long, Double)].collect().toSeq
    val plain = Bm25.scoreWithIndex(ix, spark, "quantum")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("score"), 4).as("score"))
      .orderBy(org.apache.spark.sql.functions.col("score").desc,
        org.apache.spark.sql.functions.col("doc_id"))
      .as[(Long, Double)].collect().toSeq
    assert(rm3 == plain, s"rm3 $rm3 vs plain $plain")
  }

  test("rm3 is deterministic across invocations") {
    val docs = (1L to 30L).map(i =>
      (i, s"term${i % 7} term${i % 5} term${i % 3} quantum"))
    val ix = index(docs)
    val a = Rm3.rm3TopK(ix, spark, "quantum term1", 15)
      .as[(Long, Double)].collect().toSeq
    val b = Rm3.rm3TopK(ix, spark, "quantum term1", 15)
      .as[(Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("rm3TopKBatch ≡ per-query rm3TopK, including no-expansion queries") {
    val docs = (1L to 30L).map(i =>
      (i, s"term${i % 7} term${i % 5} term${i % 3} quantum")) ++
      Seq((90L, "isolated solo"), (91L, "isolated solo"))
    val ix = index(docs)
    // "isolated solo" covers every token of its feedback docs — empty
    // expansion, the score-is-s1 fallback; the others expand normally
    val queries = Seq(1L -> "quantum term1", 2L -> "term2 term3",
      3L -> "isolated solo", 4L -> "quantum")
    val batch = Rm3.rm3TopKBatch(ix, spark, queries, 15)
      .as[(Long, Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(
        _.map(r => (r._2, r._3)).sortBy(r => (-r._2, r._1))).toMap
    queries.foreach { case (qid, q) =>
      val single = Rm3.rm3TopK(ix, spark, q, 15)
        .as[(Long, Double)].collect().toSeq.sortBy(r => (-r._2, r._1))
      assert(batch.getOrElse(qid, Nil) == single,
        s"query $qid '$q': batch ${batch.get(qid)} vs single $single")
    }
  }
}
