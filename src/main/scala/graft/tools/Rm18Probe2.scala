package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distribution probe: f6 (pooled cosine) among BM25-head docs vs
  * sem-qrels grade bands.
  */
object Rm18Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.query.Rerank.LogisticScorer
    val docs = graft.Tables.documents(spark, sfDir)
    val toks = graft.functions.TextFunctions.tokenizeBm25(col("text"))
    val dvec = LogisticScorer.pooledVecCol(toks, 8)
    import spark.implicits._
    val qv = graft.queries.EngineQueries.PlantedQueryDefs.map {
      case (qid, qt) =>
        (qid, LogisticScorer.pooledVecValue(qt.split(" ").distinct.toSeq, 8))
    }.toDF("query_id", "qv")
    val dv = docs.select(col("doc_id"), dvec.as("dv")).crossJoin(broadcast(qv))
    val dot = aggregate(zip_with(col("dv"), col("qv"), (x, y) => x * y),
      lit(0.0d), _ + _)
    val na = aggregate(transform(col("dv"), x => x * x), lit(0.0d), _ + _)
    val nb = aggregate(transform(col("qv"), x => x * x), lit(0.0d), _ + _)
    val cos = when(sqrt(na) * sqrt(nb) > 0, dot / (sqrt(na) * sqrt(nb)))
      .otherwise(lit(0.0))
    val withCos = dv.select(col("query_id"), col("doc_id"),
      greatest(cos, lit(0.0)).as("f6"))
    // f6 among ALL docs (per query), and among sem grade-3 docs
    val sem = graft.queries.EngineQueries.semQrels(spark, sfDir)
    println("[probe2] f6 quantiles over all (query, doc):")
    withCos.groupBy("query_id")
      .agg(expr("percentile(f6, array(0.5, 0.9, 0.99, 0.999))").as("q"))
      .orderBy("query_id").collect().foreach(r =>
        println(s"[probe2] q${r.getLong(0)} all ${r.getSeq[Double](1).map(v => f"$v%.3f").mkString(",")}"))
    println("[probe2] f6 quantiles among sem grade>=2 docs:")
    withCos.join(sem.filter(col("grade") >= 2.0), Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(expr("percentile(f6, array(0.1, 0.5, 0.9))").as("q"))
      .orderBy("query_id").collect().foreach(r =>
        println(s"[probe2] q${r.getLong(0)} sem ${r.getSeq[Double](1).map(v => f"$v%.3f").mkString(",")}"))
    // and among the BM25 top-20 head (what rerank actually sees)
    val ix = graft.operators.Bm25.cachedIndex(sfDir, docs, "doc_id", "text")
    val qdf = graft.queries.EngineQueries.PlantedQueryDefs.toDF("query_id", "qtext")
    val heads = graft.operators.Bm25.scoreBatch(ix, broadcast(qdf), "query_id", "qtext")
      .select(col("query_id"), col("doc_id"), round(col("score"), 4).as("score"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rk") <= 20)
    println("[probe2] f6 among bm25 top-20 head docs:")
    withCos.join(heads, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(expr("percentile(f6, array(0.1, 0.5, 0.9))").as("q"))
      .orderBy("query_id").collect().foreach(r =>
        println(s"[probe2] q${r.getLong(0)} head ${r.getSeq[Double](1).map(v => f"$v%.3f").mkString(",")}"))
    spark.stop()
  }
}
