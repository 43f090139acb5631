package graft.operators

import graft.SparkSpec

/** Retrieval metrics ([[RetrievalMetrics]]): hand-computed nDCG/MRR/P/R
  * on a tiny fixture, perfect-ranking identity, and the no-qrels zero
  * contract.
  */
class RetrievalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def round4(d: Double): Double =
    BigDecimal.valueOf(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("hand-computed metrics on a 5-deep ranking with graded qrels") {
    // ranking: docs 10,20,30,40,50 at ranks 1..5
    val ranking = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (1L, 40L, 4), (1L, 50L, 5)).toDF("query_id", "doc_id", "rank")
    // qrels: 20 -> grade 2, 40 -> grade 1, 99 (unretrieved) -> grade 3
    val qrels = Seq((1L, 20L, 2.0), (1L, 40L, 1.0), (1L, 99L, 3.0))
      .toDF("query_id", "doc_id", "grade")
    val got = RetrievalMetrics.evaluate(ranking, qrels, k = 5)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    val dcg = (math.pow(2, 2) - 1) / math.log(3) + // doc 20 at rank 2
      (math.pow(2, 1) - 1) / math.log(5) // doc 40 at rank 4
    val idcg = (math.pow(2, 3) - 1) / math.log(2) +
      (math.pow(2, 2) - 1) / math.log(3) +
      (math.pow(2, 1) - 1) / math.log(4)
    assert(got == Seq((1L, 3L, 2L, round4(dcg / idcg), round4(1.0 / 2),
      round4(2.0 / 5), round4(2.0 / 3))), s"got $got")
  }

  test("ranking the qrels in grade order scores nDCG 1.0 and MRR 1.0") {
    val ranking = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L, 3.0), (1L, 20L, 2.0), (1L, 30L, 1.0))
      .toDF("query_id", "doc_id", "grade")
    val got = RetrievalMetrics.evaluate(ranking, qrels, k = 3)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq((1L, 3L, 3L, 1.0, 1.0, 1.0, 1.0)))
  }

  test("a query whose ranking rows all sit beyond k scores zeros, not NULLs") {
    // query 2 appears in the ranking but only at rank 7 > k=5: it must
    // keep its row with ndcg/mrr/p/r all 0.0 (the NULL-dcg regression)
    val ranking = Seq((1L, 10L, 1), (2L, 10L, 7))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L, 1.0), (2L, 10L, 1.0))
      .toDF("query_id", "doc_id", "grade")
    val got = RetrievalMetrics.evaluate(ranking, qrels, k = 5)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 1.0, 1.0, round4(0.2), 1.0),
      (2L, 1L, 0L, 0.0, 0.0, 0.0, 0.0)), s"got $got")
  }

  test("qrels-only queries are excluded; grade-0 qrels shift no ideal rank") {
    // query 3 exists only in qrels → no output row (the ranking defines
    // the evaluated query set); query 1 carries a grade-0 qrels row that
    // must count nothing (not relevant) and not displace the ideal-DCG
    // rank of the relevant rows (r19 single-pass form numbers ideal ranks
    // over ALL qrels rows, relying on grade>0 rows sorting first)
    val ranking = Seq((1L, 10L, 1), (1L, 20L, 2))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L, 2.0), (1L, 15L, 0.0), (1L, 20L, 1.0),
      (3L, 10L, 3.0)).toDF("query_id", "doc_id", "grade")
    val got = RetrievalMetrics.evaluate(ranking, qrels, k = 5)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    // ideal order: 10 (g=2, irk 1), 20 (g=1, irk 2) — the g=0 row at doc
    // 15 must not land between them; ranking == ideal → ndcg 1.0
    assert(got == Seq((1L, 2L, 2L, 1.0, 1.0, round4(0.4), 1.0)), s"got $got")
  }

  test("a query with no qrels scores zeros; queries are independent") {
    val ranking = Seq((1L, 10L, 1), (2L, 10L, 1))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L, 1.0)).toDF("query_id", "doc_id", "grade")
    val got = RetrievalMetrics.evaluate(ranking, qrels, k = 5)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 1.0, 1.0, round4(0.2), 1.0),
      (2L, 0L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }
}
