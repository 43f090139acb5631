package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class KbStorageSpec extends SparkSpec {
  import spark.implicits._

  private def chunks = (0 until 200).map { i =>
    (s"doc${i % 10}", i / 10, s"chunk text number $i")
  }.toDF("sourcedoc", "sid", "text")

  test("context join: chunk side streams straight from the scan (no shuffle)") {
    spark.sql("DROP TABLE IF EXISTS chunks_bucketed")
    KbStorage.writeChunks(chunks, "chunks_bucketed", buckets = 4)
    val stored = spark.table("chunks_bucketed")
    val hits = Seq(("doc3", 5), ("doc7", 2)).toDF("sourcedoc", "sid")
    val joined = graft.operators.ContextWindow.expand(stored, hits, scope = 2)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    // the chunk FileScan must feed the join directly (Filter only) — any
    // Exchange belongs to the tiny broadcast-build (hit) side
    val probeSide = plan.split("BroadcastExchange").head
    assert(!probeSide.contains("Exchange"),
      s"chunk side shuffled:\n${plan.take(1200)}")
    assert(joined.count() == 10) // 2 hits x 5-row window
  }

  test("bucketed co-located join: large-large join on sourcedoc needs NO Exchange") {
    spark.sql("DROP TABLE IF EXISTS chunks_bucketed2")
    KbStorage.writeChunks(chunks, "chunks_bucketed2", buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val a = spark.table("chunks_bucketed2")
      val b = spark.table("chunks_bucketed2")
        .groupBy("sourcedoc").agg(count(lit(1)).as("n"))
      val joined = a.join(b, "sourcedoc")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"bucket metadata unused:\n${plan.take(1500)}")
      assert(joined.count() == 200)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF-partitioned embeddings: probe scan prunes partitions") {
    val dir = Files.createTempDirectory("graft_ivf").toString + "/emb"
    val rnd = new scala.util.Random(3)
    val assigned = (1L to 100L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()), (i % 5).toInt))
      .toDF("vec_id", "embedding", "cluster_id")
    KbStorage.writeEmbeddingsIvf(assigned, dir)
    val probed = KbStorage.readProbeClusters(spark, dir, Seq(1, 3))
    assert(probed.count() == 40)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"no partition pruning in:\n${plan.take(800)}")
    // file-level check: only the probed cluster directories are listed
    val scanned = probed.select(input_file_name()).distinct()
      .as[String].collect()
    assert(scanned.forall(f => f.contains("cluster_id=1") || f.contains("cluster_id=3")),
      "scan touched non-probed cluster files")
  }

  test("writeEmbeddingsAuto: small corpus lands flat, IVF tier lands cluster-partitioned") {
    val rnd = new scala.util.Random(11)
    // flat tier (< 1000 vectors): no cluster_id partitioning
    val flatDir = Files.createTempDirectory("graft_auto_flat").toString + "/emb"
    val small = (1L to 50L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val flatStrategy = KbStorage.writeEmbeddingsAuto(small, "vec_id", "embedding", flatDir)
    assert(flatStrategy == graft.operators.VectorSearch.IndexStrategy.Flat(highDim = false))
    assert(spark.read.parquet(flatDir).count() == 50)
    assert(!new java.io.File(flatDir).listFiles().exists(_.getName.startsWith("cluster_id=")))

    // IVF tier (>= 1000): written partitioned by cluster assignment, with
    // the policy's centroid count, and no row lost or duplicated
    val ivfDir = Files.createTempDirectory("graft_auto_ivf").toString + "/emb"
    val medium = (1L to 1200L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val ivfStrategy = KbStorage.writeEmbeddingsAuto(medium, "vec_id", "embedding", ivfDir)
    val expectedNc = math.min((4 * math.sqrt(1200)).toInt, 256)
    assert(ivfStrategy == graft.operators.VectorSearch.IndexStrategy.Ivf(expectedNc))
    assert(new java.io.File(ivfDir).listFiles().exists(_.getName.startsWith("cluster_id=")))
    val stored = spark.read.parquet(ivfDir)
    assert(stored.count() == 1200)
    assert(stored.select("vec_id").distinct().count() == 1200)
  }

  test("query log appends rows; context files concatenate") {
    val dir = Files.createTempDirectory("graft_log").toString + "/log"
    KbStorage.logQuery(spark, dir, "kb1", "q?", "a.", 12L)
    KbStorage.logQuery(spark, dir, "kb1", "q2?", "a2.", 7L)
    val log = spark.read.parquet(dir)
    assert(log.count() == 2)
    assert(log.columns.toSet == Set("ts", "kb", "query", "answer", "latency_ms"))

    val f1 = Files.createTempFile("ctx1", ".txt")
    Files.write(f1, "alpha".getBytes)
    val got = KbStorage.readContextFiles(Seq(f1.toString, "/nonexistent/file.txt"))
    assert(got == "alpha")
  }

  test("encoding converter rewrites legacy files as UTF-8") {
    val in = Files.createTempDirectory("graft_conv_in").toString
    val out = Files.createTempDirectory("graft_conv_out").toString
    Files.write(java.nio.file.Paths.get(in, "legacy.txt"),
      "café".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val n = KbStorage.convertEncoding(spark, s"$in/*", out)
    assert(n == 1)
    val rewritten = new String(
      Files.readAllBytes(java.nio.file.Paths.get(out, "legacy.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(rewritten == "café")
  }

  test("M2 batch planner matches the reference's token-limit arithmetic") {
    import graft.embed.Embedder
    val tenWords = Seq.fill(8)((1 to 10).map(i => s"w$i").mkString(" "))
    // avg tokens = 10 * 1.3 = 13; 8191/13 = 630 -> capped by maxBatchSize
    assert(Embedder.optimalBatchSize(tenWords, "text-embedding-3-small", 100) == 100)
    assert(Embedder.optimalBatchSize(tenWords, "text-embedding-3-small", 1000) == 630)
    // gemini: higher token limit but a 100-item hard cap
    assert(Embedder.optimalBatchSize(tenWords, "gemini-embedding-001", 1000) == 100)
    // unknown model falls back to the 8191 limit
    assert(Embedder.optimalBatchSize(tenWords, "deterministic-64", 1000) == 630)
    // huge chunks floor at 1 per batch
    val huge = Seq((1 to 20000).map(i => s"w$i").mkString(" "))
    assert(Embedder.optimalBatchSize(huge, "text-embedding-3-small", 100) == 1)
    // empty sample: fall back to the configured max
    assert(Embedder.optimalBatchSize(Nil, "text-embedding-3-small", 64) == 64)
    // DataFrame wrapper samples rows
    val df = tenWords.toDF("text")
    assert(Embedder.planBatchSize(df, "text", "text-embedding-3-small", 1000) == 630)
  }

  test("Retrying provider: backs off then succeeds; deterministic jitter") {
    import graft.embed.Embedder
    var calls = 0
    val flaky = new Embedder.Provider {
      val model = "flaky"; val dims = 4
      def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
        Embedder.Deterministic(4).embedBatch(texts)
      }
    }
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val got = Embedder.Retrying(flaky, maxRetries = 5, sleeper = sleeps.append(_))
      .embedBatch(Seq("x"))
    assert(calls == 3 && got.head.length == 4)
    assert(sleeps.size == 2 && sleeps(0) < sleeps(1), s"backoff must grow: $sleeps")
  }

  test("Retrying provider: NonRetryableException fails fast, no backoff") {
    import graft.embed.Embedder
    var calls = 0
    val broken = new Embedder.Provider {
      val model = "broken"; val dims = 4
      def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
        calls += 1
        throw new Embedder.NonRetryableException("bad credentials")
      }
    }
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    intercept[Embedder.NonRetryableException] {
      Embedder.Retrying(broken, maxRetries = 5, sleeper = sleeps.append(_))
        .embedBatch(Seq("x"))
    }
    assert(calls == 1 && sleeps.isEmpty,
      s"permanent failure must not retry: calls=$calls sleeps=$sleeps")
  }

  test("embedWithCache: duplicated cache keys don't fan out; null text excluded from misses") {
    import graft.embed.Embedder
    val cacheVec = Embedder.Deterministic(4).embedBatch(Seq("alpha")).head
    // the same content_key appended twice (two concurrent historical runs)
    val dupCache = Seq("alpha", "alpha").toDF("t")
      .select(Embedder.contentKey(col("t")).as("content_key"))
      .withColumn("embedding", typedLit(cacheVec.toSeq))
      .drop("t")
    val df = Seq(Some("alpha"), Some("beta"), None).toDF("text")
    val res = Embedder.embedWithCache(df, "text", dupCache, Embedder.Deterministic(4))
    val out = res.embedded.select("text").as[String].collect()
    assert(out.count(_ == "alpha") == 1, s"dup cache row fanned out: ${out.toSeq}")
    assert(out.toSet == Set("alpha", "beta"), "null-text row must not surface")
    // the null-text row must not reach the provider either: newCacheRows
    // holds exactly the one real miss
    assert(res.newCacheRows.count() == 1)
    res.unpersist()
  }
}
