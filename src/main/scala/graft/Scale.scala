package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence harness (not part of the library surface): replicates
  * the sf0.1 tables K× with shifted ids / suffixed sources (more shards —
  * the way real corpora grow) and times each operator family at 1× and K×.
  * The claim under test: every pipeline is linear in corpus size with no
  * quadratic pair blowup and no driver bottleneck. Results recorded in
  * PLANS.md round-3.
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = "/tmp/graft_scale"
    val kDocs = 20
    val kEmb = 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // let AQE re-coalesce scans of CACHED plans: the persisted index
      // tables (BM25 postings/idf, IVF assignment) are tiny per partition
      // at bench scale, and without this flag every per-query index scan
      // schedules shuffle.partitions tasks of pure overhead
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($r)")
    }

    // ── build the scaled tables once ────────────────────────────────────
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    (0 until kDocs).map(i => docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"), col("text"),
        concat(col("source"), lit(s"_$i")).as("source"), col("n_chars")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    (0 until kEmb).map(i => emb.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val bigDocs = spark.read.parquet(s"$base/documents.parquet")
    val bigEmb = spark.read.parquet(s"$base/embeddings.parquet")
    println(s"[scale] docs ${docs.count()} -> ${bigDocs.count()}, emb ${emb.count()} -> ${bigEmb.count()}")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    def queries50(e: DataFrame) = e.limit(50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    def lshPipeline(d: DataFrame): Long = {
      val sigs = operators.Dedup.minhashSignatures(d, "doc_id", "text")
      val cand = operators.Dedup.lshCandidates(
        operators.Dedup.lshBuckets(sigs, bands = 4, rowsPerBand = 4))
      operators.Dedup.jaccardPairs(d, "doc_id", "text", cand)
        .filter(col("jaccard") >= 0.5).count()
    }
    def ngram(d: DataFrame): Long =
      operators.Dedup.charNgramJaccard(d, "doc_id", "text",
        blockCol = "source", n = 3, threshold = 0.5, maxDf = 20).count()
    def components(d: DataFrame): Long =
      operators.Dedup.connectedComponents(
        operators.Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3)).count()
    def bm25batch(d: DataFrame): Long = {
      val ix = operators.Bm25.buildIndex(d, "doc_id", "text", persist = true)
      try {
        val qt = d.limit(50).select(col("doc_id").as("query_id"),
          col("text").as("qtext"))
        operators.Bm25.scoreBatch(ix, qt, "query_id", "qtext").count()
      } finally { ix.postings.unpersist(); ix.lengths.unpersist(); ix.idf.unpersist() }
    }
    def knn50(e: DataFrame): Long =
      operators.VectorSearch.bruteTopKBatchAgg(e, "vec_id", "embedding",
        queries50(e), "query_id", "qvec", 20).count()
    def pq(e: DataFrame): Long = {
      val seeds = e.limit(16).select("vec_id").collect().map(_.getLong(0)).toSeq
      val cb = operators.VectorSearch.seededPqCodebook(e, "vec_id", "embedding", seeds, m = 8)
      val q = e.limit(1).select("embedding").first().getSeq[Float](0)
      operators.VectorSearch.pqAdcTopK(
        operators.VectorSearch.pqEncode(e, "vec_id", "embedding", cb),
        "vec_id", "codes", cb, q, 20).count()
    }

    // round-8 operators: SymSpell vocab join, int8 quantized scan, IVF batch
    def spell(d: DataFrame): Long = {
      val vocab = query.Spelling.vocabulary(d, "text")
      val qs = d.limit(50).select(col("doc_id").as("qid"),
        concat(substring(col("text"), 1, 60), lit(" spakr qurey")).as("text"))
      query.Spelling.correctQueries(qs, "qid", "text", vocab).count()
    }
    def i8knn(e: DataFrame): Long = {
      val quant = e.select(col("vec_id"),
        functions.VectorFunctions.quantizeI8(col("embedding")).as("q"))
      val qv = quant.filter(col("vec_id") === 0).select("q").first().getSeq[Byte](0)
      quant.select(col("vec_id"),
          functions.VectorFunctions.cosineI8(col("q"),
            array(qv.map(b => lit(b)): _*)).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(20).count()
    }
    def ivfBatch(e: DataFrame): Long = {
      import spark.implicits._
      val cents = e.filter(col("vec_id") < 8).select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0).toInt, r.getSeq[Float](1))).toSeq
      val assigned = operators.VectorSearch.seededIvfAssign(e, "vec_id", "embedding", cents)
      val centDf = cents.toDF("cid", "cv")
      operators.VectorSearch.ivfTopKBatch(assigned, "vec_id", "embedding",
        centDf, queries50(e), "query_id", "qvec", k = 20, nprobe = 2).count()
    }

    secs(s"lsh-dedup 1x")(lshPipeline(docs))
    secs(s"lsh-dedup ${kDocs}x")(lshPipeline(bigDocs))
    secs(s"ngram-jaccard 1x")(ngram(docs))
    secs(s"ngram-jaccard ${kDocs}x")(ngram(bigDocs))
    secs(s"simhash-components 1x")(components(docs))
    secs(s"simhash-components ${kDocs}x")(components(bigDocs))
    secs(s"bm25-build+batch50 1x")(bm25batch(docs))
    secs(s"bm25-build+batch50 ${kDocs}x")(bm25batch(bigDocs))
    secs(s"knn-batch50 1x")(knn50(emb))
    secs(s"knn-batch50 ${kEmb}x")(knn50(bigEmb))
    secs(s"pq-encode+adc 1x")(pq(emb))
    secs(s"pq-encode+adc ${kEmb}x")(pq(bigEmb))
    def graphAnn(e: DataFrame): Long = {
      val n = e.count()
      val planes = operators.VectorSearch.graphPlanesFor(n)
      val g = operators.VectorSearch.knnGraph(e, "vec_id", "embedding",
        k = 8, numPlanes = planes).localCheckpoint(true)
      operators.VectorSearch.graphSearch(g, e, "vec_id", "embedding",
        queries50(e), "query_id", "qvec", k = 20, beam = 48, hops = 3,
        entryIds = Seq(0L, 100L, 200L, 300L)).count()
    }

    // the flagship serving composite: 20 full query lifecycles (enhance →
    // embed → vector + BM25 → RRF → rerank) in one DAG, including the BM25
    // index build (same build+serve attribution as the bm25 row). Corpus =
    // docs and embeddings replicated at the SAME factor so every embedding
    // id resolves to a chunk row.
    def e2e20(d: DataFrame, e: DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      val chunks = d.select(col("doc_id"), col("text"),
        col("source").as("sourcedoc"),
        (row_number().over(w) - 1).cast("int").as("sid"))
      val emb2 = e.select(col("vec_id").as("doc_id"), col("embedding"))
      val ix = operators.Bm25.buildIndex(chunks, "doc_id", "text", persist = true)
      try {
        val qs = queries.EngineQueries.E2eBatch20.zipWithIndex
          .map { case ((t, _), i) => (i + 1).toLong -> t }
        pipeline.KbPipeline.queryBatch(spark, chunks, emb2, qs,
          bm25Index = Some(ix)).count()
      } finally { ix.postings.unpersist(); ix.lengths.unpersist(); ix.idf.unpersist() }
    }
    secs(s"e2e-hybrid-batch20 1x")(e2e20(docs, emb))
    secs(s"e2e-hybrid-batch20 ${kDocs}x")(
      e2e20(bigDocs, bigEmb.filter(col("vec_id") < kDocs.toLong * 10000000L)))

    // round-9 curation operators: packing is one per-shard window (shards
    // multiply with the corpus — the partition count grows, not the
    // partition size), contamination holds the benchmark side FIXED while
    // the corpus grows (the production shape), PII scrub is a pure
    // column-expression scan
    def packing(d: DataFrame): Long =
      operators.Curation.packTokenBins(d, "source", "doc_id",
          functions.TextFunctions.wordCount(col("text")), 512)
        .agg(max("bin_id")).first().getLong(0)
    def contamination(d: DataFrame): Long = {
      val bench = d.filter(col("doc_id").isin(3, 57))
        .select(col("doc_id").as("bench_id"), col("text"))
      operators.Curation.contamination(d, "doc_id", "text",
        bench, "bench_id", "text", n = 3, threshold = 0.8).count()
    }
    def pii(d: DataFrame): Long = {
      val (scrubbed, _) = operators.Curation.scrubPii(col("text"))
      d.select(length(scrubbed).as("l")).agg(sum("l")).first().getLong(0)
    }
    secs(s"pack-token-bins 1x")(packing(docs))
    secs(s"pack-token-bins ${kDocs}x")(packing(bigDocs))
    secs(s"contamination-ngram 1x")(contamination(docs))
    secs(s"contamination-ngram ${kDocs}x")(contamination(bigDocs))
    secs(s"pii-scrub 1x")(pii(docs))
    secs(s"pii-scrub ${kDocs}x")(pii(bigDocs))

    secs(s"spell-correct50 1x")(spell(docs))
    secs(s"spell-correct50 ${kDocs}x")(spell(bigDocs))
    secs(s"i8-quantized-knn 1x")(i8knn(emb))
    secs(s"i8-quantized-knn ${kEmb}x")(i8knn(bigEmb))
    secs(s"ivf-batch50 1x")(ivfBatch(emb))
    secs(s"ivf-batch50 ${kEmb}x")(ivfBatch(bigEmb))
    secs(s"graph-build+search50 1x")(graphAnn(emb))
    secs(s"graph-build+search50 ${kEmb}x")(graphAnn(bigEmb))
    spark.stop()
  }
}
