package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation

/** The in-process query-vector serving helpers (corpus*InMemory and the
  * Tables.queryVec/seedVecs/queryBatch accessors over them) must be
  * value-identical to the distributed scans they replace, and the warm
  * batch shape must be a LocalRelation — a plan with NO scan, which is
  * the whole point (the oracle gate exercises the warm path end-to-end;
  * this spec pins warm == fallback so a residency change can never
  * silently change answers).
  */
class InMemoryServingSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(rnd: scala.util.Random, d: Int): Array[Float] =
    Array.fill(d)(rnd.nextFloat() - 0.5f)

  private val rnd = new scala.util.Random(11)
  private val vecs = (0L until 60L).map(i => i -> randVec(rnd, 16))

  // a Tables-shaped sf directory holding just the embeddings table
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_inmem").toString
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("Tables.queryVec equals the filtered-scan fallback value") {
    val viaTables = Tables.queryVec(spark, dir, 7L)
    val viaScan = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 7L)
      .select(col("embedding")).first().getSeq[Float](0)
    assert(viaTables == viaScan)
    assert(viaTables == vecs(7)._2.toSeq)
  }

  test("Tables.seedVecs equals the id-sorted collect fallback") {
    val viaTables = Tables.seedVecs(spark, dir, 8L)
    val viaScan = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 8L)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1))).toSeq.sortBy(_._1)
    assert(viaTables == viaScan)
    assert(viaTables.map(_._1) == (0 until 8))
  }

  test("Tables.queryBatch matches the scan fallback rows and plans as a LocalRelation when warm") {
    val ids = Seq(3L, 12L, 40L)
    val warm = Tables.queryBatch(spark, dir, ids, "qid", "qvec")
    val viaScan = Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    assert(asSet(warm) == asSet(viaScan))
    assert(warm.columns.toSeq == Seq("qid", "qvec"))
    // the warm shape must carry no scan: queryVec above made the corpus
    // resident for this dir, so the batch is a driver-built LocalRelation
    assert(warm.queryExecution.optimizedPlan.collect {
      case l: LocalRelation => l }.nonEmpty,
      s"expected LocalRelation, got:\n${warm.queryExecution.optimizedPlan}")
  }

  test("corpusQueriesInMemory: id-sorted, bounded, and None when over maxQueries or keyless") {
    val emb = vecs.toDF("vec_id", "embedding")
    val warm = VectorSearch.corpusQueriesInMemory(
      emb, "vec_id", "embedding", _ % 10 == 0, "qid", "qvec",
      cacheKey = Some("spec_inmem_a"))
    assert(warm.isDefined)
    assert(warm.get.select("qid").as[Long].collect().toSeq ==
      Seq(0L, 10L, 20L, 30L, 40L, 50L), "rows must come back id-sorted")
    // more matches than maxQueries: the helper must refuse, not truncate
    assert(VectorSearch.corpusQueriesInMemory(
      emb, "vec_id", "embedding", _ => true, "qid", "qvec", maxQueries = 5,
      cacheKey = Some("spec_inmem_a")).isEmpty)
    // keyless: no residency contract, callers keep the distributed scan
    assert(VectorSearch.corpusQueriesInMemory(
      emb, "vec_id", "embedding", _ == 0L, "qid", "qvec",
      cacheKey = None).isEmpty)
  }

  test("corpusVectorInMemory: present id serves the exact vector, absent id is None") {
    val emb = vecs.toDF("vec_id", "embedding")
    val got = VectorSearch.corpusVectorInMemory(
      emb, "vec_id", "embedding", 42L, cacheKey = Some("spec_inmem_a"))
    assert(got.contains(vecs(42)._2.toSeq))
    assert(VectorSearch.corpusVectorInMemory(
      emb, "vec_id", "embedding", 9999L, cacheKey = Some("spec_inmem_a")).isEmpty)
  }

  test("Tables.apply memoizes the per-(session, path) read — one plan instance") {
    val a = Tables.embeddings(spark, dir)
    val b = Tables.embeddings(spark, dir)
    assert(a eq b, "repeated reads of the same path must share one DataFrame")
  }
}
