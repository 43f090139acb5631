package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Scratch diagnostic main (not part of the library surface). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def timed(name: String)(f: => Unit): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s ${dt}%8.3f s  jobs=${jobs.get() - j0}")
    }
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = args.toSeq
    (1 to 3).foreach { pass =>
      println(s"[probe] pass $pass")
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        timed(n) { fn(spark, sfDir).count(); () }
      }
    }
    // t1 stage breakdown (warm): where do the remaining jobs come from?
    if (sys.env.contains("SPARK_GRAFT_PROBE_T1")) {
      import org.apache.spark.sql.functions.col
      (1 to 3).foreach { pass =>
        println(s"[probe] t1-deep pass $pass")
        var emb: org.apache.spark.sql.DataFrame = null
        var qv: Seq[Float] = null
        var res: org.apache.spark.sql.DataFrame = null
        timed("tables.embeddings") {
          emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
        }
        timed("queryVec") { qv = Tables.queryVec(spark, sfDir, 0) }
        timed("roundedTopKInProcess") {
          res = operators.VectorSearch.roundedTopKInProcess(emb, "vec_id",
            "embedding", Seq((0L, qv.toArray)), 20, scale = 6,
            cacheKey = Some(sfDir)).get.select(col("doc_id"), col("score"))
        }
        timed("count") { res.count(); () }
        timed("count-coalesced") { res.coalesce(1).count(); () }
        timed("collect") { res.collect(); () }
      }
    }
    // e2e stage breakdown (warm): construction vs execution
    if (sys.env.contains("SPARK_GRAFT_PROBE_E2E")) {
      val fn = SparkEntry.queries("e2e_hybrid_query")
      (1 to 3).foreach { pass =>
        println(s"[probe] e2e-deep pass $pass")
        var df: org.apache.spark.sql.DataFrame = null
        timed("construct") { df = fn(spark, sfDir) }
        timed("analyze") { df.queryExecution.analyzed; () }
        timed("optimize") { df.queryExecution.optimizedPlan; () }
        timed("plan") { df.queryExecution.executedPlan; () }
        timed("count") { df.count(); () }
        timed("collect") { df.queryExecution.executedPlan.executeCollect(); () }
      }
    }
    // NB classifier stage breakdown at KxC scale (scale-regression diag)
    if (sys.env.contains("SPARK_GRAFT_PROBE_NB")) {
      import org.apache.spark.sql.functions._
      val k = sys.env.getOrElse("SPARK_GRAFT_PROBE_NB", "20").toInt
      val docs0 = Tables.documents(spark, sfDir)
      val big = (0 until k).map(i => docs0.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"), col("text"),
          concat(col("source"), lit(s"_$i")).as("source"), col("n_chars")))
        .reduce(_ unionByName _)
        .withColumn("lbl", concat(lit("l"), pmod(col("doc_id"), lit(5))))
      big.write.mode("overwrite").parquet("/tmp/graft_probe_nb.parquet")
      val bigR = spark.read.parquet("/tmp/graft_probe_nb.parquet")
      val bucket = pmod(col("doc_id") * 2654435761L, lit(1000000007L)) % 10
      val train0 = bigR.filter(bucket < 7)
      val test0 = bigR.filter(bucket >= 7)
      (1 to 2).foreach { pass =>
        println(s"[probe] nb-deep pass $pass (k=$k)")
        var model: operators.QualityClassifier.NbModel = null
        timed("nb.train") {
          model = operators.QualityClassifier.train(train0, "doc_id", "text", "lbl") }
        timed("nb.model-materialize") {
          model.likelihoods.count(); model.oov.count(); model.priors.count(); () }
        var cls: org.apache.spark.sql.DataFrame = null
        timed("nb.classify-construct") {
          cls = operators.QualityClassifier.classify(model, test0, "doc_id", "text") }
        timed("nb.classify-count") { cls.count(); () }
        timed("nb.trainAndClassify") {
          operators.QualityClassifier.trainAndClassify(
            bigR, "doc_id", "text", "lbl").count(); () }
      }
    }
    // plan shape of batch50
    val df = SparkEntry.queries("sim_knn_batch50")(spark, sfDir)
    println(df.queryExecution.optimizedPlan.toString.take(2000))
    spark.stop()
  }
}
