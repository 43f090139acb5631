package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(rnd: scala.util.Random, d: Int): Array[Float] =
    Array.fill(d)(rnd.nextFloat() - 0.5f)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    if (na > 0 && nb > 0) d / (math.sqrt(na) * math.sqrt(nb)) else 0.0
  }

  private val rnd = new scala.util.Random(5)
  private val corpus = (1L to 100L).map(i => i -> randVec(rnd, 32))
  private val query = randVec(rnd, 32)

  test("cachedServing memoizes IvfPq artifacts per key; Flat/Ivf delegate per tier") {
    val emb = corpus.toDF("vec_id", "embedding")
    val pq = VectorSearch.IndexStrategy.IvfPq(nCentroids = 2, subquantizers = 4)
    val first = VectorSearch.cachedServing("spec_kb_a", emb, "vec_id", "embedding", pq)
    val second = VectorSearch.cachedServing("spec_kb_a", emb, "vec_id", "embedding", pq)
    // same INSTANCE: the KMeans + Lloyd training ran once for the key
    assert(first eq second, "IvfPq serving must be memoized per (session, key)")
    first match {
      case VectorSearch.Serving.IvfPq(_, _, encoded, _) =>
        assert(encoded.storageLevel.useMemory || encoded.storageLevel.useDisk,
          "probed table must be persisted")
      case other => fail(s"expected IvfPq serving, got $other")
    }
    val other = VectorSearch.cachedServing("spec_kb_b", emb, "vec_id", "embedding", pq)
    assert(!(first eq other), "distinct keys build distinct artifacts")
    // BUILD parameters are part of the cache key: a changed chooseIndex
    // outcome must rebuild, never serve stale artifacts
    val morecents = VectorSearch.cachedServing("spec_kb_a", emb, "vec_id", "embedding",
      VectorSearch.IndexStrategy.IvfPq(nCentroids = 4, subquantizers = 4))
    assert(!(first eq morecents), "different strategy params must rebuild")
    // ... but shortlist is a SERVING knob: same trained artifacts, new value
    val widershort = VectorSearch.cachedServing("spec_kb_a", emb, "vec_id", "embedding",
      pq, shortlist = 50)
    ((first, widershort): @unchecked) match {
      case (VectorSearch.Serving.IvfPq(ix0, cb0, enc0, _),
            VectorSearch.Serving.IvfPq(ix1, cb1, enc1, sl1)) =>
        assert(sl1 == 50)
        assert((ix0 eq ix1) && (cb0 eq cb1) && (enc0 eq enc1),
          "a shortlist-only change must reuse the trained index, codebook and encoded table")
    }
    // cachedIvf keys on nCentroids the same way
    val ivf2 = VectorSearch.cachedIvf("spec_kb_a", emb, "vec_id", "embedding", 2)
    val ivf4 = VectorSearch.cachedIvf("spec_kb_a", emb, "vec_id", "embedding", 4)
    assert(!(ivf2 eq ivf4), "changed nCentroids must rebuild the IVF index")
    assert(ivf4.centroids.length == 4 && ivf2.centroids.length == 2)
    assert(VectorSearch.cachedServing("spec_kb_a", emb, "vec_id", "embedding",
      VectorSearch.IndexStrategy.Flat(highDim = false)) == VectorSearch.Serving.Flat)
    VectorSearch.cachedServing("spec_kb_a", emb, "vec_id", "embedding",
      VectorSearch.IndexStrategy.Ivf(2)) match {
      case VectorSearch.Serving.Ivf(_) => ()
      case o => fail(s"expected Ivf serving, got $o")
    }
  }

  test("bruteTopK matches a local exact scan") {
    val emb = corpus.toDF("vec_id", "embedding")
    val got = VectorSearch.bruteTopK(emb, "vec_id", "embedding", query.toSeq, 10)
      .select("doc_id").as[Long].collect().toSeq
    val want = corpus.map { case (id, v) => (id, cos(v, query)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    assert(got == want)
  }

  test("appendGraph: new nodes link out and are searchable; old lists untouched") {
    val base = corpus.take(80).toDF("vec_id", "embedding")
    val all = corpus.toDF("vec_id", "embedding")
    val g0 = VectorSearch.knnGraph(base, "vec_id", "embedding", k = 8)
    val newIds = (81L to 100L).toDF("vec_id")
    val g1 = VectorSearch.appendGraph(g0, all, "vec_id", "embedding", newIds, k = 8)
    def edgeSet(g: org.apache.spark.sql.DataFrame) = g
      .select(col("src"), col("dst"), col("kind"))
      .as[(Long, Long, String)].collect().toSet
    assert(edgeSet(g1.filter(col("src") <= 80L)) == edgeSet(g0),
      "existing nodes' edge lists must be byte-identical after append")
    assert(g1.filter(col("src") > 80L).select("src").distinct().count() == 20,
      "every appended node must link out")
    // an appended node is reachable by search: querying with node 90's own
    // vector must surface doc 90 (cosine 1.0 = guaranteed rank 1 if reached)
    val q = Seq((0L, corpus(89)._2)).toDF("query_id", "qvec")
    val hits = VectorSearch.graphSearch(g1, all, "vec_id", "embedding",
        q, "query_id", "qvec", k = 10, beam = 48, hops = 3,
        entryIds = Seq(1L, 20L, 40L, 60L))
      .select("doc_id").as[Long].collect().toSet
    assert(hits.contains(90L), s"appended node must be searchable; got $hits")
  }

  test("appendIvf: append-after-build equals bulk assignment for any split") {
    val emb = corpus.toDF("vec_id", "embedding")
    val cents = corpus.take(4).zipWithIndex
      .map { case ((_, v), i) => (i, v.toSeq) }
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cluster_id").cast("int"))
      .as[(Long, Int)].collect().toSet
    val bulk = rows(VectorSearch.seededIvfAssign(emb, "vec_id", "embedding", cents))
    for (split <- Seq(1L, 50L, 100L)) {
      val base = VectorSearch.IvfIndex(
        VectorSearch.seededIvfAssign(emb.filter(col("vec_id") <= split),
          "vec_id", "embedding", cents),
        cents.map(_._2.toArray).toArray, "vec_id", "embedding")
      val appended = VectorSearch.appendIvf(base, emb.filter(col("vec_id") > split))
      assert(rows(appended.assigned) == bulk, s"split at $split")
    }
  }

  test("bruteTopKBatch returns per-query exact top-k") {
    val emb = corpus.toDF("vec_id", "embedding")
    val q2 = randVec(rnd, 32)
    val queries = Seq((1L, query), (2L, q2)).toDF("query_id", "qvec")
    val got = VectorSearch.bruteTopKBatch(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", 5)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    def want(q: Array[Float]) = corpus.map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(got(1L) == want(query))
    assert(got(2L) == want(q2))
  }

  test("TopKAggregator batch kNN == window-function batch kNN, with partial aggregation") {
    val emb = corpus.toDF("vec_id", "embedding")
    val q2 = randVec(rnd, 32)
    val queries = Seq((1L, query), (2L, q2)).toDF("query_id", "qvec")
    // inMemoryLimit = 0 forces the DISTRIBUTED formulations this spec
    // compares (the in-memory serving path has its own identity spec)
    val viaAgg = VectorSearch.bruteTopKBatchAgg(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", 7, inMemoryLimit = 0)
      .select("query_id", "rank", "doc_id").as[(Long, Int, Long)].collect().toSet
    val viaWindow = VectorSearch.bruteTopKBatch(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", 7, inMemoryLimit = 0)
      .select("query_id", "rank", "doc_id").as[(Long, Int, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    // the plan must do partial (map-side) aggregation — only k rows per
    // partition reach the shuffle
    val plan = VectorSearch.bruteTopKBatchAgg(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", 7, inMemoryLimit = 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkaggregator") ||
      plan.toLowerCase.contains("partial"), plan.take(1000))
  }

  test("chooseIndex matches the reference's size/dim thresholds") {
    import VectorSearch.IndexStrategy._
    // embed_manager.py:163-213: <1000 flat; <100k IVF 4·√n cap 256;
    // ≥100k IVFPQ cap 512, min(16, dim/64) subquantizers; dim>1536 flat
    assert(VectorSearch.chooseIndex(999, 64) == Flat(highDim = false))
    assert(VectorSearch.chooseIndex(1000, 64) ==
      Ivf(math.min((4 * math.sqrt(1000)).toInt, 256)))
    assert(VectorSearch.chooseIndex(2500, 64) == Ivf(200))
    assert(VectorSearch.chooseIndex(99999, 64) == Ivf(256))
    assert(VectorSearch.chooseIndex(100000, 64) == IvfPq(512, 1))
    assert(VectorSearch.chooseIndex(100000, 1024) == IvfPq(512, 16))
    assert(VectorSearch.chooseIndex(100000, 4096) == Flat(highDim = true))
    assert(VectorSearch.chooseIndex(500, 2000) == Flat(highDim = true))
    // subquantizers clamp to >=1 below 64 dims (the reference's dim//64
    // would be 0 there)
    assert(VectorSearch.chooseIndex(100000, 32) == IvfPq(512, 1))
  }

  test("ivfRecallProfile: monotone in nprobe, exact at full probe") {
    val emb = corpus.toDF("vec_id", "embedding")
    val index = VectorSearch.buildIvf(emb, "vec_id", "embedding", nCentroids = 4)
    val queries = Seq((1L, query)).toDF("query_id", "qvec")
    val prof = VectorSearch.ivfRecallProfile(index, queries, "query_id", "qvec",
        k = 10, nprobes = Seq(1, 2, 4))
      .select("nprobe", "recall").as[(Int, Double)].collect().toMap
    assert(prof(1) <= prof(2) && prof(2) <= prof(4),
      s"recall not monotone: $prof")
    assert(prof(4) == 1.0, s"full probe must be exact: $prof")
  }

  test("IVF with all clusters probed is exact; fewer probes trade recall") {
    val emb = corpus.toDF("vec_id", "embedding")
    val index = VectorSearch.buildIvf(emb, "vec_id", "embedding", nCentroids = 4)
    assert(index.assigned.select("cluster_id").distinct().count() <= 4)
    val exact = VectorSearch.bruteTopK(emb, "vec_id", "embedding", query.toSeq, 10)
      .select("doc_id").as[Long].collect().toSet
    val allProbes = VectorSearch.ivfTopK(index, query.toSeq, 10, nprobe = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(allProbes == exact, "nprobe = ncentroids must equal exact search")
    val oneProbe = VectorSearch.ivfTopK(index, query.toSeq, 10, nprobe = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(oneProbe.size == 10)
    val recall = (oneProbe & exact).size.toDouble / 10
    assert(recall >= 0.3, s"1-probe recall $recall suspiciously low")
  }

  test("writeIvf/readIvf round-trip: stored serving equals the built index exactly") {
    val emb = corpus.toDF("vec_id", "embedding")
    val index = VectorSearch.buildIvf(emb, "vec_id", "embedding", nCentroids = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_rt").toString
    VectorSearch.writeIvf(index, dir)
    val rd = VectorSearch.readIvf(spark, dir)
    // schema detection recovers the column roles from the stored table
    assert(rd.idCol == "vec_id" && rd.vecCol == "embedding")
    assert(rd.cacheKey.exists(_.startsWith("stored:")))
    // centroids round-trip bit-exactly, in cluster order
    assert(rd.centroids.map(_.toSeq).toSeq == index.centroids.map(_.toSeq).toSeq)
    // served top-k identical at every probe depth
    Seq(1, 2, 4).foreach { np =>
      val built = VectorSearch.ivfTopK(index, query.toSeq, 10, nprobe = np)
        .as[(Long, Double)].collect().toSeq
      val stored = VectorSearch.ivfTopK(rd, query.toSeq, 10, nprobe = np)
        .as[(Long, Double)].collect().toSeq
      assert(stored == built, s"nprobe=$np: stored $stored vs built $built")
    }
    // the at-rest scan carries the partition column probes prune on
    assert(rd.assigned.columns.contains("cluster_id"))
  }

  test("PQ: driver LUT is bit-identical to the l2Sq column expression") {
    val emb = corpus.toDF("vec_id", "embedding")
    val cb = VectorSearch.seededPqCodebook(emb, "vec_id", "embedding",
      seedIds = 1L to 8L, m = 4)
    val lut = VectorSearch.pqLut(cb, query.toSeq)
    // evaluate the SAME distances through the column function on one row
    val subDim = 8
    val exprVals = (for (s <- 0 until 4; j <- 0 until 8) yield
      graft.functions.VectorFunctions.l2Sq(
        graft.functions.VectorFunctions.vecLit(query.slice(s * subDim, (s + 1) * subDim).toSeq),
        graft.functions.VectorFunctions.vecLit(cb(s)(j)))).toSeq
    val got = spark.range(1).select(exprVals: _*).first().toSeq.map(_.asInstanceOf[Double])
    assert(got == lut.toSeq, "expression math must equal driver math bit-for-bit")
  }

  test("PQ encode: codes are the argmin codeword, seeds encode to themselves") {
    val emb = corpus.toDF("vec_id", "embedding")
    val cb = VectorSearch.seededPqCodebook(emb, "vec_id", "embedding",
      seedIds = 1L to 8L, m = 4)
    val codes = VectorSearch.pqEncode(emb, "vec_id", "embedding", cb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(c => c.length == 4 && c.forall(j => j >= 0 && j < 8)))
    // a seed vector's subvectors are IN the codebook → distance 0 → itself
    (1L to 8L).foreach { id =>
      assert(codes(id) == Seq.fill(4)((id - 1).toInt), s"seed $id self-codes")
    }
    // local argmin check on a few rows
    def l2(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    corpus.take(10).foreach { case (id, v) =>
      val want = (0 until 4).map { s =>
        val sub = v.slice(s * 8, (s + 1) * 8).toSeq
        cb(s).zipWithIndex.map { case (c, j) => (l2(sub, c), j) }.min._2
      }
      assert(codes(id) == want, s"doc $id")
    }
  }

  test("PQ codegen encode == struct-min column-function encode") {
    val emb = corpus.toDF("vec_id", "embedding")
    val cb = VectorSearch.seededPqCodebook(emb, "vec_id", "embedding",
      seedIds = 1L to 8L, m = 4)
    val fast = VectorSearch.pqEncode(emb, "vec_id", "embedding", cb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    val spec = VectorSearch.pqEncodeSpec(emb, "vec_id", "embedding", cb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(fast == spec)
  }

  test("PQ shortlist + exact re-rank recovers the exact top-k") {
    val emb = corpus.toDF("vec_id", "embedding")
    val cb = VectorSearch.seededPqCodebook(emb, "vec_id", "embedding",
      seedIds = 1L to 16L, m = 4)
    val encoded = VectorSearch.pqEncode(emb, "vec_id", "embedding", cb)
    // shortlist = whole corpus → re-rank IS the exact scan
    val got = VectorSearch.pqTopKWithRerank(encoded, "vec_id", "embedding",
        "codes", cb, query.toSeq, k = 10, shortlist = 100)
      .select("doc_id").as[Long].collect().toSeq
    val exact = corpus.map { case (id, v) =>
      var acc = 0.0; var i = 0
      while (i < v.length) { val d = v(i).toDouble - query(i).toDouble; acc += d * d; i += 1 }
      (id, math.rint(acc * 1e6) / 1e6)
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    assert(got == exact)
    // modest shortlist still beats raw ADC ranking on recall
    val adc = VectorSearch.pqAdcTopK(encoded, "vec_id", "codes", cb, query.toSeq, 10)
      .select("doc_id").as[Long].collect().toSet
    val rer = VectorSearch.pqTopKWithRerank(encoded, "vec_id", "embedding",
        "codes", cb, query.toSeq, k = 10, shortlist = 30)
      .select("doc_id").as[Long].collect().toSet
    val exactSet = exact.toSet
    assert((rer & exactSet).size >= (adc & exactSet).size)
  }

  test("trained PQ codebook beats or matches the seeded codebook on recall") {
    val emb = corpus.toDF("vec_id", "embedding")
    val exact = corpus.map { case (id, v) =>
      var acc = 0.0; var i = 0
      while (i < v.length) { val d = v(i).toDouble - query(i).toDouble; acc += d * d; i += 1 }
      (id, acc)
    }.sortBy { case (id, d) => (d, id) }.take(20).map(_._1).toSet
    def recall(cb: VectorSearch.PqCodebook): Double = {
      val enc = VectorSearch.pqEncode(emb, "vec_id", "embedding", cb)
      val got = VectorSearch.pqAdcTopK(enc, "vec_id", "codes", cb, query.toSeq, 20)
        .select("doc_id").as[Long].collect().toSet
      (got & exact).size.toDouble / 20
    }
    val seeded = recall(VectorSearch.seededPqCodebook(emb, "vec_id", "embedding", 1L to 16L, m = 4))
    val trained = recall(VectorSearch.trainedPqCodebook(emb, "vec_id", "embedding", m = 4, k = 16))
    assert(trained >= 0.5, s"trained recall@20 $trained")
    assert(trained >= seeded - 0.1, s"trained $trained should not lose to seeded $seeded")
  }

  test("PQ ADC top-k approximates the exact L2 ranking") {
    val emb = corpus.toDF("vec_id", "embedding")
    val cb = VectorSearch.seededPqCodebook(emb, "vec_id", "embedding",
      seedIds = 1L to 16L, m = 4)
    val encoded = VectorSearch.pqEncode(emb, "vec_id", "embedding", cb)
    val got = VectorSearch.pqAdcTopK(encoded, "vec_id", "codes", cb, query.toSeq, 20)
      .select("doc_id").as[Long].collect().toSet
    assert(got.size == 20)
    val exact = corpus.map { case (id, v) =>
      var acc = 0.0; var i = 0
      while (i < v.length) { val d = v(i).toDouble - query(i).toDouble; acc += d * d; i += 1 }
      (id, acc)
    }.sortBy { case (id, d) => (d, id) }.take(20).map(_._1).toSet
    val recall = (got & exact).size.toDouble / 20
    assert(recall >= 0.4, s"ADC recall@20 $recall suspiciously low for 16 codewords")
  }

  // ── graph ANN (HNSW batch analogue) ─────────────────────────────────────

  private def graphCorpus = {
    val r = new scala.util.Random(17)
    (0L until 400L).map(i => i -> randVec(r, 32)).toDF("vec_id", "embedding")
  }

  test("knnGraph: no self-edges, ranked neighbors per (node, kind), deterministic") {
    val g = VectorSearch.knnGraph(graphCorpus, "vec_id", "embedding", k = 8)
    val rows = g.select("src", "dst", "kind", "rnk").as[(Long, Long, String, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (s, d, _, _) => s != d })
    assert(rows.map(_._3).toSet == Set("l", "g"))
    rows.groupBy(r => (r._1, r._3)).foreach { case ((s, kind), es) =>
      val cap = if (kind == "l") 8 else 4
      val rks = es.map(_._4).sorted
      assert(rks.length <= cap && rks.toSeq == (1 to rks.length),
        s"bad ranks for ($s, $kind)")
    }
    val again = VectorSearch.knnGraph(graphCorpus, "vec_id", "embedding", k = 8)
      .select("src", "dst", "kind", "rnk").as[(Long, Long, String, Int)].collect()
    assert(rows.toSet == again.toSet)
  }

  test("knnGraph neighbors are ranked by descending cosine within each kind") {
    val g = VectorSearch.knnGraph(graphCorpus, "vec_id", "embedding", k = 8)
    val bad = g.withColumn("prev", lag("cos", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src", "kind").orderBy("rnk")))
      .filter(col("prev").isNotNull && col("prev") < col("cos")).count()
    assert(bad == 0)
  }

  test("graphSearch: beam search over the knn graph recovers most of the exact top-k") {
    val emb = graphCorpus
    val g = VectorSearch.knnGraph(emb, "vec_id", "embedding", k = 8)
    val queries = emb.filter(col("vec_id").isin(3L, 77L, 212L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = VectorSearch.graphSearch(g, emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 10, beam = 48, hops = 3,
        entryIds = Seq(0L, 100L, 200L, 300L))
      .select("query_id", "doc_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = VectorSearch.bruteTopKBatch(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", 10)
      .select("query_id", "doc_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      (got.getOrElse(q, Set.empty) & want).size.toDouble / want.size }
    val mean = recalls.sum / recalls.size
    // calibrated: 0.97-1.0 measured on this seed at beam=48/hops=3; the
    // long-range hash-block links are what make this reachable — the
    // sign-LSH local edges alone plateau at ~0.3 (disconnected components)
    assert(mean >= 0.8, s"graph-ANN mean recall@10 too low: $recalls")
    got.keySet.foreach(q => assert(got(q).contains(q), s"query $q did not reach itself"))
  }

  test("graphSearch: in-memory broadcast serving equals the distributed hop-join path row-for-row") {
    val emb = graphCorpus
    val g = VectorSearch.knnGraph(emb, "vec_id", "embedding", k = 8)
    val queries = emb.filter(col("vec_id").isin(3L, 77L, 212L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def run(limit: Int) = VectorSearch.graphSearch(g, emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 10, beam = 48, hops = 3,
        entryIds = Seq(0L, 100L, 200L, 300L), inMemoryLimit = limit)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    // default limit → broadcast one-stage path; 0 → distributed hop joins
    assert(run(200000) == run(0))
  }

  test("bruteTopKBatch/Agg: in-memory broadcast serving equals the distributed plans row-for-row") {
    // duplicate vectors (id+5000 copies) force score ties so the
    // (score desc, doc_id asc) tie-break is exercised on both paths
    val emb = graphCorpus.unionByName(graphCorpus.select(
      (col("vec_id") + lit(5000L)).as("vec_id"), col("embedding")))
    val queries = graphCorpus.filter(col("vec_id").isin(3L, 77L, 212L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def collectSorted(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    // the fast path REQUIRES a cacheKey (keyed-or-distributed rule)
    val ck = Some("spec|flat-inmem")
    val inMemW = collectSorted(VectorSearch.bruteTopKBatch(
      emb, "vec_id", "embedding", queries, "query_id", "qvec", 10,
      cacheKey = ck))
    val distW = collectSorted(VectorSearch.bruteTopKBatch(
      emb, "vec_id", "embedding", queries, "query_id", "qvec", 10,
      inMemoryLimit = 0))
    assert(inMemW == distW)
    val inMemA = collectSorted(VectorSearch.bruteTopKBatchAgg(
      emb, "vec_id", "embedding", queries, "query_id", "qvec", 10,
      cacheKey = ck))
    val distA = collectSorted(VectorSearch.bruteTopKBatchAgg(
      emb, "vec_id", "embedding", queries, "query_id", "qvec", 10,
      inMemoryLimit = 0))
    assert(inMemA == distA)
    assert(inMemW == inMemA) // window and agg formulations agree too
    // a driver-built (LocalRelation) query batch takes the zero-job
    // driver-side shortcut — results must be identical to every other path
    val qLocal = queries.as[(Long, Array[Float])].collect().toSeq
      .toDF("query_id", "qvec")
    val inMemL = collectSorted(VectorSearch.bruteTopKBatchAgg(
      emb, "vec_id", "embedding", qLocal, "query_id", "qvec", 10,
      cacheKey = ck))
    assert(inMemL == distA)
    // keyless calls never take the fast path (they would re-collect per
    // call with zero reuse) — still identical results via the plan
    assert(collectSorted(VectorSearch.bruteTopKBatchAgg(
      emb, "vec_id", "embedding", queries, "query_id", "qvec", 10)) == distA)
    // a LARGE in-memory corpus (>= the spread threshold) repartitions the
    // query set for parallelism — results must stay identical
    val big = (0 until 20).map(r => graphCorpus.select(
        (col("vec_id") + lit(r * 10000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val bigInMem = collectSorted(VectorSearch.bruteTopKBatchAgg(
      big, "vec_id", "embedding", queries, "query_id", "qvec", 10,
      cacheKey = Some("spec|flat-big")))
    val bigDist = collectSorted(VectorSearch.bruteTopKBatchAgg(
      big, "vec_id", "embedding", queries, "query_id", "qvec", 10,
      inMemoryLimit = 0))
    assert(bigInMem == bigDist)
  }

  test("ivfTopKBatch: keyed in-memory serving equals the distributed probe/scan plan row-for-row") {
    val emb = graphCorpus.unionByName(graphCorpus.select(
      (col("vec_id") + lit(5000L)).as("vec_id"), col("embedding")))
    val centSeq = graphCorpus.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1))).sortBy(_._1).toSeq
    val cents = centSeq.map { case (cid, cv) => (cid, cv.toArray) }
      .toDF("cid", "cv")
    val assigned = VectorSearch.seededIvfAssign(emb, "vec_id", "embedding", centSeq)
    val queries = graphCorpus.filter(col("vec_id").isin(3L, 77L, 212L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def run(ck: Option[String], lim: Int) = VectorSearch.ivfTopKBatch(
        assigned, "vec_id", "embedding", cents, queries, "query_id", "qvec",
        k = 10, nprobe = 3, inMemoryLimit = lim, cacheKey = ck)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val inMem = run(Some("spec|ivf-inmem"), 200000)
    val dist = run(Some("spec|ivf-inmem"), 0) // limit 0 forces distributed
    assert(inMem == dist)
    assert(run(None, 200000) == dist) // keyless never takes the fast path
  }

  test("bruteTopK: in-memory single-query serving equals the distributed TakeOrdered plan") {
    val emb = graphCorpus.unionByName(graphCorpus.select(
      (col("vec_id") + lit(5000L)).as("vec_id"), col("embedding")))
    val qv = graphCorpus.filter(col("vec_id") === 3L)
      .select("embedding").as[Array[Float]].head().toSeq
    def run(limit: Int) = VectorSearch.bruteTopK(
        emb, "vec_id", "embedding", qv, 10, inMemoryLimit = limit,
        cacheKey = Some("spec|flat-single"))
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(run(200000) == run(0))
    // a corpus over the limit falls back to the distributed plan
    assert(run(5) == run(0))
  }

  test("graphSearchDeduped: duplicate-saturated corpus keeps exact-grade recall") {
    // 5x exact replication: the regime where plain graphSearch collapses
    // (recall ~0.08 at 50x, tools/recall_r10.txt) because identical copies
    // saturate every sorted-neighborhood window. The deduped variant builds
    // the graph over unique vectors and expands copies afterward.
    val uniq = graphCorpus
    val rep = (0 until 5).map(r => uniq.select(
        (col("vec_id") + lit(r * 1000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val queries = uniq.filter(col("vec_id").isin(3L, 77L, 212L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = VectorSearch.graphSearchDeduped(rep, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10, kGraph = 8, numPlanes = 4,
      beam = 48, hops = 3, nEntries = 4)
    val rows = got.select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect()
    // ranks contiguous 1..10 per query
    rows.groupBy(_._1).foreach { case (q, es) =>
      assert(es.map(_._4).sorted.toSeq == (1 to 10), s"bad ranks for query $q") }
    // copies of one vector (same id mod 1000) carry identical scores
    rows.groupBy(r => (r._1, r._2 % 1000L)).foreach { case (key, es) =>
      assert(es.map(_._3).distinct.length == 1, s"copy scores diverge at $key") }
    // recall vs EXACT search over the replicated corpus
    val gotSets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = VectorSearch.bruteTopKBatch(rep, "vec_id", "embedding",
        queries, "query_id", "qvec", 10)
      .select("query_id", "doc_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      (gotSets.getOrElse(q, Set.empty) & want).size.toDouble / want.size }
    val mean = recalls.sum / recalls.size
    // measured 1.0 on this seed: the 400-unique graph is the one the plain
    // recall spec already proves out; expansion preserves exact ordering
    assert(mean >= 0.8, s"deduped graph-ANN recall too low on duplicates: $recalls")
    // memoized serving path (cacheKey) is value-identical to the fresh
    // build, on the first call and on reuse
    def keyed() = VectorSearch.graphSearchDeduped(rep, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 10, kGraph = 8, numPlanes = 4,
        beam = 48, hops = 3, nEntries = 4, cacheKey = Some("spec_dedup_serve"))
      .select("query_id", "doc_id", "rank").as[(Long, Long, Int)].collect().toSet
    val fresh = rows.map(r => (r._1, r._2, r._4)).toSet
    assert(keyed() == fresh, "cached dedup serving diverged from fresh build")
    assert(keyed() == fresh, "cache reuse diverged")
  }

  test("graphSearchDeduped degenerate: fully-collapsed corpus and empty queries") {
    // the operator's own extreme: EVERY row is one vector value -> one
    // representative, an edgeless 1-node graph, and the walk still finds it;
    // expansion then surfaces k copies with identical scores
    val one = Array(1f, 2f, 3f)
    val all = (1L to 20L).map(i => i -> one).toDF("vec_id", "embedding")
    val q = Seq((7L, one)).toDF("query_id", "qvec")
    val res = VectorSearch.graphSearchDeduped(all, "vec_id", "embedding",
        q, "query_id", "qvec", k = 5, kGraph = 4, numPlanes = 2,
        beam = 8, hops = 2, nEntries = 2)
      .select("doc_id", "score", "rank").as[(Long, Double, Int)].collect()
      .sortBy(_._3)
    assert(res.map(_._1).toSeq == (1L to 5L), s"expected lowest-id copies, got ${res.toSeq}")
    assert(res.map(_._2).distinct.length == 1 && res.head._2 == 1.0)
    // empty query set -> empty result, no crash
    val none = VectorSearch.graphSearchDeduped(all, "vec_id", "embedding",
      q.filter(lit(false)), "query_id", "qvec", k = 5, kGraph = 4,
      numPlanes = 2, beam = 8, hops = 2, nEntries = 2)
    assert(none.count() == 0)
  }

  test("graphPlanesFor sizes plane count to expected bucket ~targetBucket") {
    assert(VectorSearch.graphPlanesFor(0) == 1)
    assert(VectorSearch.graphPlanesFor(64) == 1)
    assert(VectorSearch.graphPlanesFor(2000) == 5)
    assert(VectorSearch.graphPlanesFor(100000) == 11)
    assert(VectorSearch.graphPlanesFor(Long.MaxValue) == 20) // capped
  }

  test("graphSearch degenerate inputs: absent entries yield empty, tiny corpus works") {
    val emb = graphCorpus
    val g = VectorSearch.knnGraph(emb, "vec_id", "embedding", k = 8)
    val queries = emb.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // entry ids not present in the corpus: the walk has nowhere to start —
    // empty result, no crash (HNSW with an absent entry point would fail
    // harder; the join-shape degrades to zero rows)
    val absent = VectorSearch.graphSearch(g, emb, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 5, beam = 16, hops = 2,
      entryIds = Seq(999999L))
    assert(absent.count() == 0)
    // 2-node corpus: graph may have few/no sign-bucket pairs, but the
    // hash-block long links still connect it
    val tiny = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f)))
      .toDF("vec_id", "embedding")
    val tg = VectorSearch.knnGraph(tiny, "vec_id", "embedding", k = 2)
    val tq = tiny.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val res = VectorSearch.graphSearch(tg, tiny, "vec_id", "embedding",
      tq, "query_id", "qvec", k = 2, beam = 4, hops = 1, entryIds = Seq(0L))
    assert(res.count() == 2) // reaches both nodes via the long link
  }

  test("refineGraph: NN-Descent round weakly improves every node's neighbor quality") {
    val emb = graphCorpus
    val g = VectorSearch.knnGraph(emb, "vec_id", "embedding", k = 8)
    val r = VectorSearch.refineGraph(g, emb, "vec_id", "embedding", k = 8, rounds = 1)
    // long links pass through untouched
    val gLong = g.filter(col("kind") === "g").select("src", "dst", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val rLong = r.filter(col("kind") === "g").select("src", "dst", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(gLong == rLong)
    // per-node total cosine of kept local edges is non-decreasing: the old
    // edges are always in the refinement candidate set
    def quality(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("kind") === "l").groupBy("src")
        .agg(sum("cos").as("q"), count(lit(1)).as("cnt"))
        .as[(Long, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val qg = quality(g)
    val qr = quality(r)
    qg.foreach { case (src, (qOld, cntOld)) =>
      val (qNew, cntNew) = qr(src)
      assert(cntNew >= cntOld, s"node $src lost edges")
      if (cntNew == cntOld)
        assert(qNew >= qOld - 1e-9, s"node $src got worse: $qOld -> $qNew")
    }
    // and search recall over the refined graph does not regress
    val queries = emb.filter(col("vec_id").isin(3L, 77L, 212L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def recall(graph: org.apache.spark.sql.DataFrame): Double = {
      val got = VectorSearch.graphSearch(graph, emb, "vec_id", "embedding",
          queries, "query_id", "qvec", k = 10, beam = 48, hops = 3,
          entryIds = Seq(0L, 100L, 200L, 300L))
        .select("query_id", "doc_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = VectorSearch.bruteTopKBatch(emb, "vec_id", "embedding",
          queries, "query_id", "qvec", 10)
        .select("query_id", "doc_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (q, w) => (got.getOrElse(q, Set.empty[Long]) & w).size.toDouble / w.size }
      rs.sum / rs.size
    }
    val base = recall(g)
    val refined = recall(r)
    assert(refined >= base - 0.1, s"refined recall regressed: $base -> $refined")
  }

  test("graphSearch respects beam >= k and returns ranked rows") {
    val emb = graphCorpus
    val g = VectorSearch.knnGraph(emb, "vec_id", "embedding", k = 8)
    val queries = emb.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    intercept[IllegalArgumentException] {
      VectorSearch.graphSearch(g, emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 10, beam = 5, hops = 1, entryIds = Seq(0L))
    }
    val res = VectorSearch.graphSearch(g, emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5, beam = 16, hops = 2,
        entryIds = Seq(0L, 100L))
      .select("rank").as[Int].collect().sorted.toSeq
    assert(res == (1 to res.length))
  }

  test("ivfPqTopKBatch equals the per-query probe→ADC→re-rank composition row-for-row") {
    val emb = corpus.toDF("vec_id", "embedding")
    val cents = corpus.take(4).map { case (id, v) => (id.toInt - 1, v.toSeq) }
    val assigned = VectorSearch.seededIvfAssign(emb, "vec_id", "embedding", cents)
    val cb = VectorSearch.seededPqCodebook(emb, "vec_id", "embedding",
      seedIds = 1L to 8L, m = 4)
    val encoded = VectorSearch.pqEncode(assigned, "vec_id", "embedding", cb)
      .localCheckpoint(true)
    val centArr = cents.map(_._2.toArray).toArray
    val qs = corpus.take(6).map { case (id, v) => (id + 1000L, v.toSeq) }
    for ((np, sl, k) <- Seq((2, 20, 5), (4, 10, 5), (1, 30, 10))) {
      val batch = VectorSearch.ivfPqTopKBatch(encoded, "vec_id", "embedding",
          "codes", cb, centArr, qs, k, np, sl)
        .select("query_id", "doc_id", "rank").as[(Long, Long, Int)]
        .collect().toSet
      val single = qs.flatMap { case (qid, qv) =>
        val probes = VectorSearch.probeIdsExact(spark, centArr, qv, np)
        val enc = encoded.filter(col("cluster_id").isin(probes: _*))
        val short = VectorSearch.pqAdcTopK(enc, "vec_id", "codes", cb, qv, sl)
          .select(col("doc_id").as("vec_id"))
        VectorSearch.bruteTopK(enc.join(short, Seq("vec_id"), "left_semi"),
            "vec_id", "embedding", qv, k)
          .select(col("doc_id").cast("long")).as[Long].collect()
          .zipWithIndex.map { case (d, i) => (qid, d, i + 1) }
      }.toSet
      assert(batch == single,
        s"np=$np sl=$sl k=$k: batch diverged\n extra=${batch -- single}\n missing=${single -- batch}")
    }
  }
}
