package graft.queries

import org.apache.spark.sql.functions._

/** Pins the depth-pooled construction of the r18 semantic qrels
  * (EngineQueries.semQrels) — the m15_retrieval_planted_sem oracle
  * hash-gates the VALUES; this spec pins the structural contract the
  * values depend on, so a refactor that silently widens the pool or
  * shifts the bands fails with a named reason instead of a hash diff.
  */
class SemQrelsShapeSpec extends graft.SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sem qrels grade only documents inside the BM25 top-200 pool") {
    assume(new java.io.File(s"$dir/documents.parquet").exists,
      "driver testdata not present")
    val docs = graft.Tables.documents(spark, dir)
    val ix = graft.operators.Bm25.cachedIndex(dir, docs, "doc_id", "text")
    val pool = graft.operators.Bm25.scoreBatch(ix,
        broadcast(EngineQueries.plantedQueries(spark)),
        "query_id", "qtext")
      .select(col("query_id"), col("doc_id"),
        round(col("score"), 4).as("s"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("s").desc, col("doc_id"))))
      .filter(col("rk") <= 200)
      .select("query_id", "doc_id")
    val outside = EngineQueries.semQrels(spark, dir)
      .join(pool, Seq("query_id", "doc_id"), "left_anti").count()
    assert(outside == 0L, s"$outside graded rows outside the depth pool")
  }

  test("bands are rank-banded 20/30/50 with grades 3/2/1 and at most 100 per query") {
    assume(new java.io.File(s"$dir/documents.parquet").exists,
      "driver testdata not present")
    val q = EngineQueries.semQrels(spark, dir)
      .groupBy("query_id", "grade").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    val qids = q.keys.map(_._1).toSeq.distinct
    assert(qids.nonEmpty)
    qids.foreach { qid =>
      val g3 = q.getOrElse((qid, 3.0), 0L)
      val g2 = q.getOrElse((qid, 2.0), 0L)
      val g1 = q.getOrElse((qid, 1.0), 0L)
      // at sf0.001 the pool can run short of 100; bands fill in order
      assert(g3 <= 20 && g2 <= 30 && g1 <= 50,
        s"q$qid band sizes $g3/$g2/$g1 exceed 20/30/50")
      assert(g3 + g2 + g1 <= 100, s"q$qid graded ${g3 + g2 + g1} > 100")
      if (g2 > 0) assert(g3 == 20, s"q$qid grade-2 rows before band 3 is full")
      if (g1 > 0) assert(g2 == 30, s"q$qid grade-1 rows before band 2 is full")
    }
  }
}
