package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch stage-level profiler (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    secs("warmup") { spark.range(1000000).selectExpr("sum(id)").collect() }
    val ix = operators.Bm25.cachedIndex(sfDir,
      Tables.documents(spark, sfDir), "doc_id", "text")
    secs("index-materialize") {
      ix.postings.count(); ix.lengths.count(); ix.idf.count(); ix.stats.count()
    }

    def chunks = Tables.chunksWithSid(spark, sfDir)
    def emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("embedding"))

    // stage-by-stage
    secs("enhance-job") {
      spark.range(1).select(query.Enhancement.enhance(lit(queries.EngineQueries.E2eQueryText)).as("q")).first()
    }
    secs("enhance-job-2nd") {
      spark.range(1).select(query.Enhancement.enhance(lit(queries.EngineQueries.E2eQueryText + " x")).as("q")).first()
    }
    secs("enhanceValue") {
      query.Enhancement.enhanceValue(spark, queries.EngineQueries.E2eQueryText + " y")
    }
    secs("enhanceValue-2nd") {
      query.Enhancement.enhanceValue(spark, queries.EngineQueries.E2eQueryText + " z")
    }
    val enhanced = spark.range(1)
      .select(query.Enhancement.enhance(lit(queries.EngineQueries.E2eQueryText)).as("q")).first().getString(0)
    val qvec = embed.Embedder.Deterministic(64).embedBatch(Seq(enhanced)).head.toSeq
    secs("vtop") {
      emb.select(col("doc_id"),
          round(functions.VectorFunctions.cosine(col("embedding"),
            functions.VectorFunctions.vecLit(qvec)), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(20).count()
    }
    secs("bm25-scored") {
      operators.Bm25.scoreWithIndex(ix, spark, enhanced)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(1000).count()
    }
    // sub-steps of the warm single-query BM25 path
    locally {
      val terms = functions.TextFunctions.tokenizeBm25Value(spark, enhanced)
      secs("bm25-tokens-fold") {
        functions.TextFunctions.tokenizeBm25Value(spark, enhanced)
      }
      secs("bm25-idf-filter") {
        ix.idf.filter(col("term").isin(terms.distinct: _*)).count()
      }
      secs("bm25-postings-filter") {
        ix.postings.filter(col("term").isin(terms.distinct: _*)).count()
      }
      secs("bm25-post-x-lengths") {
        ix.postings.filter(col("term").isin(terms.distinct: _*))
          .join(ix.lengths, "doc_id").count()
      }
      secs("bm25-scored-2nd") {
        operators.Bm25.scoreWithIndex(ix, spark, enhanced)
          .select(col("doc_id"), round(col("score"), 4).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(1000).count()
      }
      secs("bm25-scored-3rd") {
        operators.Bm25.scoreWithIndex(ix, spark, enhanced)
          .select(col("doc_id"), round(col("score"), 4).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(1000).count()
      }
    }
    secs("full-pipeline-1st") {
      pipeline.KbPipeline.query(spark, chunks, emb,
        queries.EngineQueries.E2eQueryText, bm25Index = Some(ix)).hits.count()
    }
    secs("full-pipeline-2nd") {
      pipeline.KbPipeline.query(spark, chunks, emb,
        queries.EngineQueries.E2eQueryText, bm25Index = Some(ix)).hits.count()
    }
    locally {
      // job/stage census of the warm single-query path
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
          val i = s.stageInfo
          val ms = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b).getOrElse(-1L)
          println(f"[profile]   stage ${i.stageId}%3d tasks=${i.numTasks}%3d ${ms}%5d ms  ${i.name.take(90)}")
        }
      }
      spark.sparkContext.addSparkListener(l)
      secs("full-pipeline-3rd") {
        pipeline.KbPipeline.query(spark, chunks, emb,
          queries.EngineQueries.E2eQueryText, bm25Index = Some(ix)).hits.count()
      }
      spark.sparkContext.removeSparkListener(l)
      println(s"[profile] full-pipeline-3rd jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    }
    locally {
      // the SERVING shape: corpusKey routes the flat vector stage through
      // the guarded in-process search (zero vector-stage jobs) on top of
      // the keyed index's in-process BM25 — warm floor + census
      secs("full-pipeline-keyed-1st") {
        pipeline.KbPipeline.query(spark, chunks, emb,
          queries.EngineQueries.E2eQueryText, bm25Index = Some(ix),
          corpusKey = Some(sfDir)).hits.count()
      }
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      secs("full-pipeline-keyed-warm") {
        pipeline.KbPipeline.query(spark, chunks, emb,
          queries.EngineQueries.E2eQueryText, bm25Index = Some(ix),
          corpusKey = Some(sfDir)).hits.count()
      }
      spark.sparkContext.removeSparkListener(l)
      println(s"[profile] full-pipeline-keyed-warm jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    }
    locally {
      // split the warm floor into PLAN vs EXECUTE: a re-count of the SAME
      // DataFrame reuses its analyzed/optimized plan (queryExecution is a
      // lazy val), so the delta vs a fresh build is pure Catalyst planning
      val df = pipeline.KbPipeline.query(spark, chunks, emb,
        queries.EngineQueries.E2eQueryText, bm25Index = Some(ix)).hits
      secs("plan-only") { df.queryExecution.executedPlan; () }
      secs("samedf-count-1st") { df.count(); () }
      secs("samedf-count-2nd") { df.count(); () }
      secs("samedf-count-3rd") { df.count(); () }
    }
    // other slow ones
    secs("hybrid_batch") { SparkEntry.queries("hybrid_batch")(spark, sfDir).count() }
    secs("hybrid_batch-2nd") { SparkEntry.queries("hybrid_batch")(spark, sfDir).count() }
    secs("j5_weighted_batch") { SparkEntry.queries("j5_weighted_batch")(spark, sfDir).count() }
    secs("dedup_ngram_jaccard") { SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count() }
    secs("dedup_ngram_jaccard-2nd") { SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count() }
    locally {
      import graft.functions.TextFunctions
      val docs = Tables.documents(spark, sfDir)
      val g0 = docs
        .select(col("doc_id"), col("source").as("block"),
          TextFunctions.cleanText(col("text")).as("_s"))
        .select(col("doc_id"), col("block"),
          explode(array_distinct(filter(
            transform(sequence(lit(0), greatest(length(col("_s")) - 3, lit(0))),
              i => col("_s").substr(i + 1, lit(3))),
            gg => length(gg) === 3))).as("ng"))
      secs("ngram-g0-count") { println("g0=" + g0.count()) }
      secs("ngram-g0-count-2nd") { g0.count() }
      val w = Window.partitionBy("block", "ng")
      val g = g0.withColumn("_df", count(lit(1)).over(w))
        .filter(col("_df") <= 20).drop("_df")
      secs("ngram-g-count") { println("g=" + g.count()) }
      val grouped = g.groupBy("block", "ng")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      secs("ngram-grouped") { println("grouped=" + grouped.count()) }
      val pairs = grouped
        .select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))),
            y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      secs("ngram-pairs") { println("pairs=" + pairs.count()) }
    }
    locally {
      val emb = Tables.embeddings(spark, sfDir)
      val quant = emb.select(col("vec_id").as("doc_id"),
        functions.VectorFunctions.quantizeI8(col("embedding")).as("q"))
      var qq: Seq[Byte] = null
      secs("i8-first") { qq = quant.filter(col("doc_id") === 0)
        .select(col("q")).first().getSeq[Byte](0) }
      secs("i8-first-2nd") { quant.filter(col("doc_id") === 0)
        .select(col("q")).first() }
      val qLit = array(qq.map(b => lit(b)): _*)
      secs("i8-scan") {
        quant.select(col("doc_id"),
            round(functions.VectorFunctions.cosineI8(col("q"), qLit), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(20).count()
      }
      secs("i8-scan-2nd") {
        quant.select(col("doc_id"),
            round(functions.VectorFunctions.cosineI8(col("q"), qLit), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(20).count()
      }
      secs("i8-full") { SparkEntry.queries("sim_knn_quantized")(spark, sfDir).count() }
      secs("i8-full-2nd") { SparkEntry.queries("sim_knn_quantized")(spark, sfDir).count() }
    }
    secs("m7_rerank") { SparkEntry.queries("m7_rerank")(spark, sfDir).count() }
    secs("m7_rerank-2nd") { SparkEntry.queries("m7_rerank")(spark, sfDir).count() }
    locally {
      val docs = Tables.documents(spark, sfDir)
      var pairs: org.apache.spark.sql.DataFrame = null
      secs("cc-simhash-pairs") {
        pairs = operators.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println("pairs=" + pairs.count())
      }
      secs("cc-loop") {
        println("nodes=" + operators.Dedup.connectedComponents(pairs).count())
      }
      secs("cc-full") { SparkEntry.queries("dedup_components")(spark, sfDir).count() }
    }
    locally {
      val docs = Tables.documents(spark, sfDir)
      val sigs = operators.Dedup.minhashSignatures(docs, "doc_id", "text")
      secs("lsh-sigs") { println("sigs=" + sigs.count()) }
      val cand = operators.Dedup.lshCandidates(
        operators.Dedup.lshBuckets(sigs, bands = 4, rowsPerBand = 4))
      secs("lsh-cand") { println("cand=" + cand.count()) }
      secs("lsh-jaccard") {
        println("jac=" + operators.Dedup.jaccardPairs(docs, "doc_id", "text", cand).count())
      }
      secs("lsh-full") { SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count() }
    }

    // r11: curation-decision cost attribution — .count() prunes projections,
    // so force full-row evaluation via toRdd
    if (sys.env.get("SPARK_GRAFT_PROFILE").contains("curation")) {
      import graft.functions.TextFunctions
      val docs = Tables.documents(spark, sfDir)
      def full(df: DataFrame): Long = df.queryExecution.toRdd.count()
      secs("cur-tokens") { full(docs.select(col("doc_id"),
        size(TextFunctions.tokenize(col("text"))).as("n"))) }
      secs("cur-rep3") { full(docs.select(col("doc_id"),
        round(TextFunctions.repetitionRatio(col("text"), 3), 6).as("r"))) }
      secs("cur-quality") { full(docs.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"))) }
      secs("cur-lm-full") { full(operators.LmQuality.score(docs, "doc_id", "text", 24)) }
      secs("cur-decision-full") { full(operators.Curation.curationDecision(docs, "doc_id", "text", vocabSize = 24)) }
    }

    // r11: full-row vs count() cost for the projection-heavy query rungs —
    // count() lets Catalyst prune the projection, so a bench row can hide
    // an expensive interpreted expression (how the rep3 7.7 s was found)
    if (sys.env.get("SPARK_GRAFT_PROFILE").contains("fullrows")) {
      def full(df: DataFrame): Long = df.queryExecution.toRdd.count()
      for (name <- Seq("f2_enhanced_clean", "f5_metadata", "f6_enhance",
          "f8_spell_correct", "f9_content_keys", "m8_answer_batch",
          "m7_rerank_batch", "s_chunker", "f_pii_scrub", "f_quality_score",
          "mm_png_decode", "mm_bmp_decode",
          // r12 additions: the classifier, the composed pipeline, and the
          // warm-served queries (their LocalRelation results must carry
          // their real materialized cost, not a count shortcut)
          "f_nb_domain_classifier", "e2e_data_pipeline", "e2e_hybrid_query",
          "e2e_hybrid_batch20", "t1_cosine_knn", "t2_bm25_topk",
          "u1_stopword_union", "m3_retry_schedule",
          // r12 continuation: the codegen DSIR scorer and the bigram LM
          // are projection-shaped — count() must not hide their walk
          "f_dsir_weights", "t10_dsir_resample", "f_lm_bigram",
          "m14_nb_accuracy", "s12_shard_export")) {
        val fn = SparkEntry.queries(name)
        secs(s"count  $name") { fn(spark, sfDir).count() }
        secs(s"full   $name") { full(fn(spark, sfDir)) }
      }
    }
    spark.stop()
  }
}
