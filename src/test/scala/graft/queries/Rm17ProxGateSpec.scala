package graft.queries

/** The round-17 de-circularization gate (verdict r16 #2): round 16's
  * learned-beats-bm25 receipt graded qrels by the same tf-mass signal the
  * winning scorer featured. This spec holds the learned reranker to a
  * SECOND planted family graded by ordered-bigram PROXIMITY — a positional
  * signal none of the unordered features can see — so the win measures
  * generalization, not feature-signal alignment. Both families are also
  * hash-gated per round (⊕ m15_retrieval_planted, ⊕
  * m15_retrieval_planted_prox).
  *
  * The honest history this gate pins down (tools/eval_r17.txt): the
  * 5-feature r16 model LOST to its own BM25 head on proximity qrels
  * (0.273 vs 0.317 nDCG@10 at sf0.001), so r17 added the f5
  * significant-excess collocation feature — and three simpler f5 variants
  * (raw count, first-pair discount, mean-centered) each re-ordered the
  * tf-graded head on CHANCE adjacency and broke the Rm16 gate before the
  * significance threshold fixed both.
  */
class Rm17ProxGateSpec extends graft.SparkSpec {

  test("proximity-qrels: the learned reranker beats the raw bm25 head on mean nDCG") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists,
      "driver testdata not present")
    val means = EngineQueries.retrievalPlantedProx(spark, dir)
      .groupBy("variant").agg(org.apache.spark.sql.functions.avg("ndcg").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means.keySet == Set("bm25", "learned"), means.toString)
    assert(means("learned") > means("bm25"),
      s"learned mean nDCG@10 ${means("learned")} <= bm25 ${means("bm25")} " +
        "on the de-circularized proximity family")
  }

  test("the pretrained model carries a live proximity weight") {
    // a dead f5 (w5 ≈ 0) would pass the mean gate through the backbone
    // alone — the feature must actually participate
    val m = graft.query.Rerank.LogisticScorer.pretrained
    assert(m.w(5) > 0.5, s"proximity weight ${m.w(5)} is not live")
  }
}
