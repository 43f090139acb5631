package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.Embedder

/** Query-side caches ([[QueryCache]]): hits read FROM the table and never
  * touch the scorer/provider, misses compute once and round-trip as
  * appendable rows, duplicated cache rows don't fan out.
  */
class QueryCacheSpec extends SparkSpec {
  import spark.implicits._

  test("rerank cache: hits come from the table, misses from the scorer, appends round-trip") {
    val cands = Seq(
      (1L, "spark join", 10L, "spark join filter doc"),
      (1L, "spark join", 20L, "cooking pasta"),
      (2L, "pasta", 10L, "spark join filter doc"))
      .toDF("query_id", "qtext", "doc_id", "text")
    val scorer = graft.query.Rerank.lexicalScoreCols(
      array_distinct(graft.functions.TextFunctions.tokenizeBm25(col("qtext"))),
      col("text"))
    val empty = Seq.empty[(String, Long, Double)]
      .toDF("query_key", "doc_id", "rscore")
    val cold = QueryCache.rerankWithCache(cands, "qtext", "doc_id", empty, scorer)
    assert(cold.newCacheRows.count() == 3) // all misses
    val direct = cands.withColumn("rscore", scorer)
      .select("query_id", "doc_id", "rscore")
      .as[(Long, Long, Double)].collect().toSet
    assert(cold.scored.select("query_id", "doc_id", "rscore")
      .as[(Long, Long, Double)].collect().toSet == direct)
    // warm: poisoned scorer — a single miss would poison the values
    val warm = QueryCache.rerankWithCache(cands, "qtext", "doc_id",
      cold.newCacheRows, lit(-999.0))
    assert(warm.newCacheRows.count() == 0)
    assert(warm.scored.select("query_id", "doc_id", "rscore")
      .as[(Long, Long, Double)].collect().toSet == direct)
  }

  test("rerank cache: a duplicated cache row does not fan candidates out") {
    val cands = Seq((1L, "spark join", 10L, "spark join doc"))
      .toDF("query_id", "qtext", "doc_id", "text")
    val key = cands.select(Embedder.contentKey(col("qtext"))).head.getString(0)
    val dupCache = Seq((key, 10L, 0.5), (key, 10L, 0.5))
      .toDF("query_key", "doc_id", "rscore")
    val r = QueryCache.rerankWithCache(cands, "qtext", "doc_id",
      dupCache, lit(-999.0))
    assert(r.scored.count() == 1)
    assert(r.scored.select("rscore").as[Double].head() == 0.5)
  }

  test("embedQueryCached: miss calls the provider once, the repeat is served at rest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qcache").toString + "/qcache"
    var calls = 0
    val counting = new Embedder.Provider {
      val model = "counting-8"; val dims = 8
      def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
        calls += texts.size
        Embedder.Deterministic(8).embedBatch(texts)
      }
    }
    val v1 = QueryCache.embedQueryCached(spark, dir, "spark join", counting)
    assert(calls == 1)
    // the repeat must be served from the table — the refusing provider
    // makes "no provider call" a property the run enforces; it mirrors the
    // real provider's model name because the cache is keyed (model, dims)
    val v2 = QueryCache.embedQueryCached(spark, dir, "spark join",
      QueryCache.refusingProvider(8, mirrorModel = "counting-8"))
    assert(v2.toSeq == v1.toSeq)
    // a different query misses and appends alongside
    QueryCache.embedQueryCached(spark, dir, "pasta", counting)
    assert(calls == 2)
    assert(spark.read.parquet(s"$dir/counting-8_8").count() == 2)
    // a DIFFERENT model (or dims) never hits the first model's rows: the
    // at-rest cache separates by (model, dims) subdirectory
    var otherCalls = 0
    val otherModel = new Embedder.Provider {
      val model = "other-8"; val dims = 8
      def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
        otherCalls += texts.size
        Embedder.Deterministic(8).embedBatch(texts)
      }
    }
    QueryCache.embedQueryCached(spark, dir, "spark join", otherModel)
    assert(otherCalls == 1, "model change must MISS, not serve stale vectors")
    // the driver-side key twin matches the column form
    val colKey = Seq(Tuple1("spark join")).toDF("t")
      .select(Embedder.contentKey(col("t"))).head.getString(0)
    assert(QueryCache.contentKeyValue("spark join") == colKey)
  }

  test("refusing provider throws on any miss; a fully warm embed pass succeeds") {
    val queries = Seq((1L, "spark join"), (2L, "pasta"))
      .toDF("query_id", "text")
    val empty = Seq.empty[(String, Array[Float])].toDF("content_key", "embedding")
    intercept[Exception] { // cold pass against the refusing provider: boom
      Embedder.embedWithCache(queries, "text", empty,
        QueryCache.refusingProvider(8)).embedded.count()
    }
    val cold = Embedder.embedWithCache(queries, "text", empty,
      Embedder.Deterministic(8))
    val warm = Embedder.embedWithCache(queries, "text", cold.newCacheRows,
      QueryCache.refusingProvider(8))
    assert(warm.embedded.count() == 2) // served entirely by the cache join
    assert(warm.newCacheRows.count() == 0)
  }
}
