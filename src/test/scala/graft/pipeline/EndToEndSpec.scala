package graft.pipeline

import graft.SparkSpec
import graft.config.KbConfig
import graft.embed.Embedder
import graft.operators.Bm25
import graft.query.AnswerGen
import graft.sources.KbStorage
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** The reference's E2E workflow test (`tests/integration/test_end_to_end
  * .py:15-123`: database → embed → query round trip) against real files on
  * disk — the full library surface in one pass, with the deterministic
  * provider standing in for the remote models.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("files on disk -> ingest -> embed(cache) -> persisted BM25 -> hybrid query -> formatted answer") {
    // 1. a tiny corpus: the planted fact lives in one file
    val dir = Files.createTempDirectory("graft_e2e").toString
    Files.write(Paths.get(dir, "spark.txt"),
      ("spark shuffles exchange data between stages . " +
        "the catalyst optimizer rewrites logical plans . " +
        "broadcast joins copy the small table to every executor")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(dir, "pets.txt"),
      ("cats sleep sixteen hours a day . dogs enjoy long walks outside . " +
        "goldfish have short memories").getBytes(StandardCharsets.UTF_8))

    // 2. database verb over the real files
    val chunks0 = graft.ingest.Ingest.ingestFiles(spark, s"$dir/*.txt",
      chunkSize = 12, overlap = 3)
    val chunks = chunks0
      .withColumn("doc_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("sourcedoc", "sid")).cast("long"))
      .select(col("doc_id"), col("chunk_text").as("text"), col("sourcedoc"), col("sid"))
      .cache()
    assert(chunks.count() > 2, "chunking produced too few rows")

    // 3. embed verb with an empty cache, then AGAIN with the produced cache
    //    -> second pass must call the provider for zero rows
    val emptyCache = Seq.empty[(String, Array[Float])].toDF("content_key", "embedding")
    val cfg = KbConfig(vectorDimensions = 16, queryTopK = 4,
      rerankingTopK = 4, queryContextScope = 1)
    val first = KbPipeline.embed(chunks, "text", emptyCache, cfg)
    val cacheRows = first.newCacheRows.cache()
    assert(cacheRows.count() == chunks.select("text").distinct().count())
    val second = KbPipeline.embed(chunks, "text", cacheRows, cfg)
    assert(second.newCacheRows.count() == 0, "warm cache must skip the provider")

    val embeddings = first.embedded.select(col("doc_id"), col("embedding"))

    // 4. BM25 index: build, persist to parquet, reload (S8 round trip)
    val ixDir = Files.createTempDirectory("graft_e2e_ix").toString
    Bm25.writeIndex(Bm25.buildIndex(chunks, "doc_id", "text"), ixDir)
    val ix = Bm25.readIndex(spark, ixDir)

    // 5. the flagship query verb
    val res = KbPipeline.query(spark, chunks, embeddings,
      "how do broadcast joins work in spark", cfg, bm25Index = Some(ix))
    val topDoc = res.hits.orderBy("final_rank").select("text").as[String].first()
    assert(topDoc.contains("broadcast"), s"wrong top hit: $topDoc")
    assert(res.formatted.contains("broadcast joins copy the small table"),
      s"formatted context missing the planted fact:\n${res.formatted}")

    // 6. extractive answer over the formatted context (M8)
    val answer = AnswerGen.answer("default", res.formatted,
      "how do broadcast joins work in spark")
    assert(answer.toLowerCase.contains("broadcast"), s"answer: $answer")

    // 7. query log (S9)
    val logDir = Files.createTempDirectory("graft_e2e_log").toString + "/log"
    KbStorage.logQuery(spark, logDir, "e2e_kb", "how do broadcast joins work", answer, 42L)
    assert(spark.read.parquet(logDir).count() == 1)
  }
}
