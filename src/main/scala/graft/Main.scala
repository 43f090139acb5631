package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.config.KbConfig
import graft.pipeline.{KbPipeline, Tuning}

/** The reference's CLI surface (SURVEY Appendix: `customkb <verb> ...`) as a
  * Spark application. A KB here is a directory of parquet tables
  * (`chunks/`, `embeddings/`, `cache/`, `bm25/`) — the reference's
  * `$VECTORDBS/<name>/` directory re-imagined for a cluster filesystem.
  *
  * Verbs:
  * {{{
  *   runMain graft.Main database <kbDir> <inputGlob> [cfg.ini]
  *   runMain graft.Main embed    <kbDir> [cfg.ini]
  *   runMain graft.Main bm25     <kbDir>
  *   runMain graft.Main query    <kbDir> "<query text>" [cfg.ini]
  *   runMain graft.Main optimize <kbDir>
  *   runMain graft.Main verify-indexes <kbDir>
  * }}}
  */
object Main {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def loadCfg(args: Array[String], idx: Int): KbConfig =
    if (args.length > idx)
      KbConfig.load(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(args(idx)))))
    else KbConfig.load()

  def main(args: Array[String]): Unit = {
    val spark = session()
    try run(args, spark)
    finally spark.stop()
  }

  /** Verb dispatch against a caller-owned session (main owns stop()). */
  def run(args: Array[String], spark: SparkSession): Unit = {
    require(args.length >= 2, "usage: graft.Main <verb> <kbDir> [...]")
    val verb = args(0)
    val kb = args(1).stripSuffix("/")

    verb match {
      case "database" =>
        require(args.length >= 3, "database <kbDir> <inputGlob> [cfg.ini]")
        val cfg = loadCfg(args, 3)
        val chunks = graft.ingest.Ingest.ingestFiles(spark, args(2),
            chunkSize = cfg.dbMaxTokens, overlap = cfg.dbMaxTokens / 4)
          .withColumn("doc_id",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy("sourcedoc", "sid")).cast("long"))
        chunks.write.mode("overwrite").parquet(s"$kb/chunks")
        println(s"[graft] database: ${spark.read.parquet(s"$kb/chunks").count()} chunks -> $kb/chunks")

      case "embed" =>
        val cfg = loadCfg(args, 2)
        val chunks = spark.read.parquet(s"$kb/chunks")
        val cachePath = s"$kb/cache"
        val cache =
          if (new java.io.File(cachePath).exists()) spark.read.parquet(cachePath)
          else {
            import spark.implicits._
            Seq.empty[(String, Array[Float])].toDF("content_key", "embedding")
          }
        val res = KbPipeline.embed(chunks, "chunk_text", cache, cfg)
        res.embedded.select(col("doc_id"), col("embedding"))
          .write.mode("overwrite").parquet(s"$kb/embeddings")
        res.newCacheRows.write.mode("append").parquet(cachePath)
        res.unpersist()
        println(s"[graft] embed: ${spark.read.parquet(s"$kb/embeddings").count()} vectors -> $kb/embeddings")

      case "bm25" =>
        val chunks = spark.read.parquet(s"$kb/chunks")
          .withColumnRenamed("chunk_text", "text")
        graft.operators.Bm25.writeIndex(
          graft.operators.Bm25.buildIndex(chunks, "doc_id", "text"), s"$kb/bm25")
        println(s"[graft] bm25: index -> $kb/bm25")

      case "query" =>
        require(args.length >= 3, "query <kbDir> \"<text>\" [cfg.ini]")
        val cfg = loadCfg(args, 3)
        val chunks = spark.read.parquet(s"$kb/chunks")
          .withColumnRenamed("chunk_text", "text")
        val emb = spark.read.parquet(s"$kb/embeddings")
        val ix =
          if (new java.io.File(s"$kb/bm25").exists())
            Some(graft.operators.Bm25.readIndex(spark, s"$kb/bm25"))
          else None
        val t0 = System.nanoTime()
        val res = KbPipeline.query(spark, chunks, emb, args(2), cfg, bm25Index = ix)
        println(res.formatted)
        graft.sources.KbStorage.logQuery(spark, s"$kb/logs", kb, args(2),
          answer = "", latencyMs = (System.nanoTime() - t0) / 1000000)

      case "optimize" =>
        val bytes = new java.io.File(s"$kb/chunks").listFiles()
          .map(_.length()).sum
        val advice = Tuning.advise(bytes,
          Runtime.getRuntime.availableProcessors(),
          Runtime.getRuntime.maxMemory())
        println(s"[graft] optimize: $advice")

      case "verify-indexes" =>
        val findings = Tuning.verifyLayout(spark, s"`$kb`.chunks",
          Some(s"$kb/embeddings_ivf")) // catalog-registered KBs only
        val pathFindings = Seq(
          s"$kb/chunks" -> "chunk table", s"$kb/embeddings" -> "embeddings",
          s"$kb/bm25/postings" -> "bm25 postings").flatMap { case (p, what) =>
          if (!new java.io.File(p).exists()) Some(s"$what missing at $p") else None
        }
        val all = pathFindings // layout findings need catalog tables
        if (all.isEmpty) println("[graft] verify-indexes: healthy")
        else all.foreach(f => println(s"[graft] verify-indexes: $f"))

      case "dedup" =>
        // extension verb (training-pipeline suite): exact + MinHash-LSH +
        // SimHash near-dup pair tables over the chunk table
        import graft.operators.Dedup
        val chunks = spark.read.parquet(s"$kb/chunks")
          .withColumnRenamed("chunk_text", "text")
        Dedup.exactGroups(chunks, "doc_id", "text")
          .filter(col("dup_id") =!= col("keep_id"))
          .write.mode("overwrite").parquet(s"$kb/dedup/exact")
        val sigs = Dedup.minhashSignatures(chunks, "doc_id", "text")
        val cand = Dedup.lshCandidates(Dedup.lshBuckets(sigs, bands = 4, rowsPerBand = 4))
        Dedup.jaccardPairs(chunks, "doc_id", "text", cand)
          .filter(col("jaccard") >= 0.7)
          .write.mode("overwrite").parquet(s"$kb/dedup/minhash_lsh")
        Dedup.simhashPairs(chunks, "doc_id", "text")
          .write.mode("overwrite").parquet(s"$kb/dedup/simhash")
        Seq("exact", "minhash_lsh", "simhash").foreach { d =>
          println(s"[graft] dedup: ${spark.read.parquet(s"$kb/dedup/$d").count()} pairs -> $kb/dedup/$d")
        }

      case "knn" =>
        // extension verb: top-k nearest chunks to a given doc_id. The index
        // strategy is auto-selected by corpus size/dim exactly as the
        // reference does per search (embed_manager.py:163-213): flat = exact
        // scan; ivf/ivfpq = cluster-probed scan (nprobe = ncentroids/4,
        // ≥1 — the reference's default nprobe heuristic regime).
        require(args.length >= 3, "knn <kbDir> <doc_id> [k]")
        import graft.operators.VectorSearch
        import VectorSearch.IndexStrategy._
        val k = if (args.length > 3) args(3).toInt else 10
        val emb = spark.read.parquet(s"$kb/embeddings")
        val n = emb.count()
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        val strategy = VectorSearch.chooseIndex(n, dim)
        val qv = emb.filter(col("doc_id") === args(2).toLong)
          .select("embedding").head().getSeq[Float](0)
        println(s"[graft] knn: strategy=${strategy.kind} (n=$n dim=$dim)")
        val hits = strategy match {
          case Flat(_) =>
            VectorSearch.bruteTopK(emb, "doc_id", "embedding", qv, k)
          case Ivf(nc) =>
            VectorSearch.ivfTopK(
              VectorSearch.cachedIvf(s"$kb/embeddings", emb, "doc_id", "embedding", nc),
              qv, k, nprobe = math.max(1, nc / 4))
          case IvfPq(nc, _) => // PQ codes are an at-rest artifact (`pq` verb);
            // the interactive verb probes IVF clusters with exact scoring
            VectorSearch.ivfTopK(
              VectorSearch.cachedIvf(s"$kb/embeddings", emb, "doc_id", "embedding", nc),
              qv, k, nprobe = math.max(1, nc / 4))
        }
        hits.collect().foreach(r => println(f"[graft] knn: ${r.getLong(0)} ${r.getDouble(1)}%.6f"))

      case "components" =>
        // extension verb: duplicate-GROUP closure over the stored dedup
        // pair tables (run `dedup` first) — emits (node, component) so a
        // keep-one-per-group policy is a min() filter away
        import graft.operators.Dedup
        val pairs = spark.read.parquet(s"$kb/dedup/minhash_lsh")
          .select("doc_a", "doc_b")
          .unionByName(spark.read.parquet(s"$kb/dedup/simhash")
            .select("doc_a", "doc_b"))
          .distinct()
        Dedup.connectedComponents(pairs)
          .write.mode("overwrite").parquet(s"$kb/dedup/components")
        val comp = spark.read.parquet(s"$kb/dedup/components")
        println(s"[graft] components: ${comp.count()} nodes in " +
          s"${comp.select("component").distinct().count()} groups -> $kb/dedup/components")

      case "pq" =>
        // extension verb: build the PQ-encoded table (codes replace raw
        // vectors for first-pass ANN scoring; 32x smaller at 64-dim f32).
        // m defaults to the auto-selection policy's subquantizer count for
        // this corpus (chooseIndex), overridable as arg 2.
        import graft.operators.VectorSearch
        val emb = spark.read.parquet(s"$kb/embeddings")
        val m =
          if (args.length > 2) args(2).toInt
          else {
            val dim = emb.select(size(col("embedding"))).head().getInt(0)
            VectorSearch.chooseIndex(emb.count(), dim) match {
              case VectorSearch.IndexStrategy.IvfPq(_, sub) => sub
              case _ => math.max(1, math.min(16, dim / 8)) // small corpus: denser codes
            }
          }
        val seeds = emb.select("doc_id").orderBy("doc_id").limit(16)
          .collect().map(_.getLong(0)).toSeq
        val cb = VectorSearch.seededPqCodebook(emb, "doc_id", "embedding", seeds, m)
        VectorSearch.pqEncode(emb, "doc_id", "embedding", cb)
          .select("doc_id", "codes")
          .write.mode("overwrite").parquet(s"$kb/pq_codes")
        println(s"[graft] pq: ${spark.read.parquet(s"$kb/pq_codes").count()} " +
          s"vectors encoded (m=$m, k=${seeds.length}) -> $kb/pq_codes")

      case other => sys.error(s"unknown verb $other")
    }
  }
}
