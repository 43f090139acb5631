package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Receipt harness for the eval verb's retrieval-quality A/B
  * (tools/eval_r15.txt): builds a kb from a testdata documents table
  * (chunks → deterministic embed → at-rest BM25) and runs
  * `eval --rerank`, which prints nDCG@k/MRR/P@k/R@k for the plain BM25
  * ranking plus the lexical and the in-repo-trained learned rerankers on
  * shared pseudo-qrels. Not part of the library surface.
  *
  * Usage: `runMain graft.EvalReceipt [sfDir] [kbDir]`
  */
object EvalReceipt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val kb = if (args.length > 1) args(1) else "/tmp/graft_evalkb"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.select(col("doc_id"), col("text").as("chunk_text"),
        col("source").as("sourcedoc"))
      .write.mode("overwrite").parquet(s"$kb/chunks")
    Main.run(Array("embed", kb), spark)
    Main.run(Array("bm25", kb), spark)
    val queriesArg =
      "spark join filter window;;hash merge batch scan;;sort table row value"
    // planted LEXICAL qrels (the TREC shape the --qrels flag reads):
    // per query, docs ranked by total query-term OCCURRENCES (raw tf
    // mass, ties by doc_id) — top 20 grade 3, next 30 grade 2, next 50
    // grade 1, everything else non-relevant. Deterministic, graded, and
    // SMALL (100 relevant docs out of 5000), so rankings can actually
    // disagree — a first cut by "contains ≥1 term" graded ~everything
    // relevant and saturated every scorer at 1.0; the deterministic hash
    // embedder's cosine tier (the pseudo-qrels default) has the opposite
    // failure, relevance-uncorrelated → all-zeros (receipted below).
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    val qSeq = queriesArg.split(";;").toSeq.zipWithIndex
      .map { case (t, i) => ((i + 1).toLong, t) }
    import spark.implicits._
    val qterms = qSeq.toDF("query_id", "qtext")
      .select(col("query_id"), explode(array_distinct(
        TextFunctions.tokenizeBm25(col("qtext")))).as("term"))
    docs.select(col("doc_id"), explode(
        TextFunctions.tokenizeBm25(col("text"))).as("term"))
      .join(qterms, "term")
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("tfm"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("tfm").desc, col("doc_id"))))
      .filter(col("rk") <= 100)
      .select(col("query_id"), col("doc_id"),
        when(col("rk") <= 20, 3.0).when(col("rk") <= 50, 2.0)
          .otherwise(1.0).as("grade"))
      .write.mode("overwrite").parquet(s"$kb/qrels")
    println("[receipt] A/B vs the vector-tier PSEUDO-qrels (deterministic " +
      "hash embedder -> expected ~0 for every scorer):")
    Main.run(Array("eval", kb, queriesArg, "10", "--rerank"), spark)
    println("[receipt] A/B vs planted LEXICAL qrels (--qrels):")
    Main.run(Array("eval", kb, queriesArg, "10", "--rerank",
      s"--qrels=$kb/qrels"), spark)
    spark.stop()
  }
}
