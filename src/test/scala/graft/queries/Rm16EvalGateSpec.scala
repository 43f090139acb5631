package graft.queries

import org.apache.spark.sql.functions._

/** The round-16 eval gate: the learned reranker must BEAT the raw BM25
  * head it re-orders on planted tf-mass qrels (tools/eval_r16.txt's A/B,
  * hash-gated per round by the m15_retrieval_planted oracle entry — the
  * hash pins the VALUES; this spec asserts the INEQUALITY, so a retrain
  * or feature change that silently regresses the learned path below its
  * own baseline fails the suite even if both engines still agree).
  */
class Rm16EvalGateSpec extends graft.SparkSpec {

  test("planted-qrels metrics: the learned reranker beats the raw bm25 head") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists,
      "driver testdata not present")
    val means = EngineQueries.retrievalPlanted(spark, dir)
      .groupBy("variant").agg(avg("ndcg").as("mean_ndcg"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means.keySet == Set("bm25", "learned"), means.toString)
    assert(means("learned") > means("bm25"),
      s"learned mean nDCG@10 ${means("learned")} <= bm25 ${means("bm25")}")
  }

  test("per-query: learned >= bm25 nDCG on every planted query") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists,
      "driver testdata not present")
    val byQ = EngineQueries.retrievalPlanted(spark, dir)
      .select("variant", "query_id", "ndcg")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    (1L to 3L).foreach { q =>
      assert(byQ(("learned", q)) >= byQ(("bm25", q)),
        s"q$q: learned ${byQ(("learned", q))} < bm25 ${byQ(("bm25", q))}")
    }
  }
}
