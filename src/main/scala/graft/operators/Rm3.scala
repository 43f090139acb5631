package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** RM3 pseudo-relevance feedback (Lavrenko & Croft 2001 relevance
  * models; the Abdul-Jaleel et al. 2004 RM3 interpolation): run BM25,
  * mine expansion terms from the TOP-RANKED documents, and re-score with
  * the interpolated query — the corpus-driven complement to the
  * reference's static WordNet-style synonym expansion
  * (`/root/reference/query/enhancement.py:59-126`).
  *
  * Deterministic contract (what makes a two-pass iterative retrieval
  * value-oracle-able): every selection boundary is rounded-then-ordered —
  * pass-1 scores round to 4 dp before the (score DESC, doc_id) top-`fbDocs`
  * cut; expansion weights `w(t) = Σ_d tf(t,d)·s1(d)` round to 4 dp before
  * the (w DESC, term) top-`fbTerms` cut; normalized weights and the final
  * λ-interpolation round to 4 dp. Both engines make identical cuts.
  *
  * 100 TB shape: pass 1 is the standard pruned-postings BM25 plan; the
  * feedback-doc posting slice is |fbDocs| documents (a broadcast-joined
  * filter on the postings, bucket-prunable by doc); the expansion term
  * list is `fbTerms` rows on the driver (the same k-bounded collect the
  * serving paths use); pass 2 (r18) is a MATRIX product, not a join
  * fan-out: per-(term, doc) scores once per expansion term, one
  * groupBy(doc_id) into bounded int-keyed per-doc maps, per-query
  * weighting and the λ-blend map-side against k-bounded literals — no
  * shuffle carries a query dimension, so batched shuffle volume is
  * Σ_t df(t) + |corpus-candidates|, independent of |queries|. The
  * batched pass-1 postings slice is persisted and re-served to pass 2
  * for overlap terms (at-rest IO: expansion terms skew corpus-frequent,
  * i.e. the longest lists; on local[32] the page cache hides this —
  * receipted as a wash there, kept for the cluster read path).
  */
object Rm3 {

  /** Interpolation weight of the ORIGINAL query's scores. */
  val Lambda = 0.5

  private def round4(d: Double): Double =
    BigDecimal.valueOf(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Top-k RM3 retrieval: `(doc_id, score)` with
    * `score = round(λ·s1 + (1−λ)·Σ_t wn(t)·bm25term(t, d), 4)`,
    * ordered (score DESC, doc_id), positive scores only.
    */
  def rm3TopK(ix: Bm25.Index, spark: org.apache.spark.sql.SparkSession,
              query: String, k: Int, fbDocs: Int = 10, fbTerms: Int = 10,
              k1: Double = Bm25.K1, b: Double = Bm25.B): DataFrame = {
    import spark.implicits._
    val s1 = Bm25.scoreWithIndex(ix, spark, query, k1, b)
      .select(col("doc_id"), round(col("score"), 4).as("s1"))
      .localCheckpoint(false) // both the head and the final blend re-read it
      // fresh attribute ids: the checkpoint's LogicalRDD KEEPS the postings
      // relation's exprIds, and the head plan below joins postings again —
      // without the re-alias the join sees the same doc_id id on both sides
      // (DeduplicateRelations dedups repeated relations, not a
      // relation-vs-checkpoint collision) and analysis throws
      .select(col("doc_id").as("doc_id"), col("s1").as("s1"))
    // pass-1 head — fbDocs rows, deterministic under the rounded
    // (s1 DESC, doc_id) order. Kept as a PLAN (broadcast-hinted k-bounded
    // limit), not a driver collect: the expansion-mining collect below is
    // then the ONLY action before the returned plan's own
    val top = s1.orderBy(col("s1").desc, col("doc_id")).limit(fbDocs)
    val qTerms = TextFunctions.tokenizeBm25Value(spark, query).distinct
    val topDf = broadcast(top.select(col("doc_id"), col("s1").as("s1d")))
    // expansion-term mining: relevance-weighted term mass over the
    // feedback docs, original query terms excluded
    val expansion = ix.postings
      .join(topDf, "doc_id")
      .filter(!col("term").isin(qTerms: _*))
      .groupBy("term")
      .agg(round(sum(col("tf") * col("s1d")), 4).as("w"))
      .orderBy(col("w").desc, col("term")).limit(fbTerms)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    if (expansion.isEmpty)
      return s1.select(col("doc_id"), col("s1").as("score"))
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("doc_id")).limit(k)
    val wSum = expansion.map(_._2).sum
    val wn = expansion.map { case (t, w) => (t, round4(w / wSum)) }
    val expTerms = wn.map(_._1)
    val wnDf = broadcast(wn.toDF("term", "wn"))
    val stats = ix.idf.select("term", "idf")
      .filter(col("term").isin(expTerms: _*))
      .join(wnDf, "term")
    // bucket-pruned like pass 1 (was a term-IN filter over ALL buckets —
    // on a term-bucketed store the expansion terms touch few directories)
    val es = Bm25.prunedPostings(ix, expTerms)
      .join(broadcast(stats), "term")
      .groupBy("doc_id")
      .agg(round(sum(col("wn") *
        Bm25.termScore(col("tf"), col("doc_len"), lit(ix.avgdl), col("idf"),
          k1, b)), 4).as("es"))
    // final precision is 5 dp, NOT 4: λ=0.5 of two 4 dp inputs is exactly
    // a 5 dp value, so rounding at 4 dp would sit exactly ON the half
    // boundary where Spark's BigDecimal(HALF_UP) and DuckDB's
    // multiply-then-nearbyint disagree (measured: 0.92805 → 0.928 vs
    // 0.9281). At 5 dp the blend is exactly representable — no boundary.
    s1.join(es, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(lit(Lambda) * coalesce(col("s1"), lit(0.0)) +
          lit(1.0 - Lambda) * coalesce(col("es"), lit(0.0)), 5).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** BATCHED RM3: N queries through the same two-pass retrieval with a
    * FIXED number of Spark actions for the whole batch (3: the pass-1
    * scoring materialization doubling as the per-query head collect, the
    * expansion-term mining collect, and whatever action consumes the
    * returned plan) — the serving regime where the per-query cost is the
    * retrieval itself, not per-action overhead. Value-identical to
    * [[rm3TopK]] per query (same rounded cuts, same blend; the
    * empty-expansion fallback keeps the same score-is-s1 contract).
    * Returns `(query_id, doc_id, score)`, top-k per query by
    * (score DESC, doc_id).
    *
    * 100 TB shape: pass 1 is ONE bucket-pruned postings scan for the
    * union of all queries' terms ([[Bm25.scoreBatch]]); the per-query
    * heads and expansion cuts are k-bounded collects (|queries|·fbDocs /
    * ·fbTerms rows); pass 2 is again one pruned scan over the union of
    * expansion terms. Nothing scales with |queries| except tiny
    * broadcast relations.
    */
  /** Corpus-size gate for the batched pass-1 slice reuse (r18
    * optimization): persisting the pruned pass-1 postings pays when pass
    * 2's re-scan of the OVERLAP terms' buckets is expensive — i.e. when
    * posting lists are long (the 100× receipts: 20.8→15.4 s word-soup,
    * 20.5→12.0 s zipf, tools/scale_r18.txt). Under this many corpus
    * docs the whole slice is a few MB the page cache already covers, and
    * the persist is pure overhead (~6.5% on the 1× row, receipted in
    * tools/bench_r18_local.txt) — plus a cached RDD the returned plan
    * pins for the session. Both regimes are row-identical by
    * construction (the union IS prunedPostings(ix, expTerms)); the
    * staged receipt API keeps its explicit reuseP1 knob.
    */
  val ReuseP1MinDocs = 50000L

  def rm3TopKBatch(ix: Bm25.Index, spark: org.apache.spark.sql.SparkSession,
                   queries: Seq[(Long, String)], k: Int,
                   fbDocs: Int = 10, fbTerms: Int = 10,
                   k1: Double = Bm25.K1, b: Double = Bm25.B): DataFrame =
    rm3BatchCore(ix, spark, queries, k, fbDocs, fbTerms, k1, b,
      reuseP1 = ix.nDocs > ReuseP1MinDocs, probe = None)

  /** Receipt instrumentation: [[rm3TopKBatch]] with each pass forced by
    * its own action and wall-clock attributed into `probe` (keys: pass1,
    * mine, pass2+blend). `reuseP1 = false` is the counterfactual serving
    * plan without the shared pass-1 postings slice — same JVM, same
    * store, so the A/B is host-drift-free. Adds one extra action (the
    * pass-1 count); production serving stays on the 3-action core.
    */
  private[graft] def rm3TopKBatchStaged(
      ix: Bm25.Index, spark: org.apache.spark.sql.SparkSession,
      queries: Seq[(Long, String)], k: Int,
      fbDocs: Int = 10, fbTerms: Int = 10, reuseP1: Boolean = true)
      : (Long, Seq[(String, Double)]) = {
    val probe = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val out = rm3BatchCore(ix, spark, queries, k, fbDocs, fbTerms,
      Bm25.K1, Bm25.B, reuseP1, Some(probe))
    val t0 = System.nanoTime()
    val n = out.count()
    probe("pass2+blend") = (System.nanoTime() - t0) / 1e9
    (n, probe.toSeq)
  }

  private def rm3BatchCore(ix: Bm25.Index,
                           spark: org.apache.spark.sql.SparkSession,
                           queries: Seq[(Long, String)], k: Int,
                           fbDocs: Int, fbTerms: Int,
                           k1: Double, b: Double,
                           reuseP1: Boolean,
                           probe: Option[scala.collection.mutable.Map[String, Double]])
      : DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query_id in batch")
    def timed[T](label: String)(f: => T): T = probe match {
      case Some(m) =>
        val t0 = System.nanoTime()
        val r = f
        m(label) = m.getOrElse(label, 0.0) + (System.nanoTime() - t0) / 1e9
        r
      case None => f
    }
    val qt = queries.toDF("query_id", "qtext")
    val qTermPairs = queries.flatMap { case (qid, q) =>
      TextFunctions.tokenizeBm25Value(spark, q).distinct.map(t => (qid, t))
    }
    val knownTerms = qTermPairs.map(_._2).distinct
    // THE pass-1 postings slice — pruned once, and (r18, the two-pass
    // fusion) persisted so pass 2 re-reads the expansion terms that are
    // ALSO original terms from memory instead of re-scanning their
    // buckets at rest. Expansion terms skew toward corpus-frequent terms
    // (the mining weight is relevance-weighted raw tf), so on realistic
    // vocabularies the overlap covers the most expensive posting lists.
    val p1post =
      if (reuseP1)
        Bm25.prunedPostings(ix, knownTerms)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else Bm25.prunedPostings(ix, knownTerms)
    // pass 1, all queries in ONE pruned scan; checkpointed because both the
    // head collect and the final blend re-read it
    val s1 = Bm25.scoreBatch(ix, broadcast(qt), "query_id", "qtext", k1, b,
        knownTerms = Some(knownTerms), postingsOverride = Some(p1post))
      .select(col("query_id"), col("doc_id"), round(col("score"), 4).as("s1"))
      .localCheckpoint(false)
      // fresh attribute ids (see rm3TopK): the head plan joins postings
      // again, and the checkpoint keeps the postings relation's exprIds.
      // (Dropping the checkpoint and recomputing pass 1 for the blend was
      // A/B'd in r16 against the page-pruned scan: 27.1 s vs 21.6 s at
      // 100× — the 10M-row cache still wins.)
      .select(col("query_id").as("query_id"), col("doc_id").as("doc_id"),
        col("s1").as("s1"))
    probe.foreach(_ => timed("pass1")(s1.count()))
    val headW = Window.partitionBy("query_id")
      .orderBy(col("s1").desc, col("doc_id"))
    // per-query heads as a PLAN (|queries|·fbDocs rows, broadcast-hinted)
    // — not a driver collect: the expansion-mining collect below is then
    // the only action before the returned plan's own, and it materializes
    // the s1 checkpoint on the way
    val topDf = broadcast(s1.withColumn("rk", row_number().over(headW))
      .filter(col("rk") <= fbDocs)
      .select(col("query_id"), col("doc_id"), col("s1").as("s1d")))
    val exclDf = broadcast(qTermPairs.toDF("query_id", "term"))
    // expansion mining for every query in ONE postings pass (the feedback
    // docs' postings only — the topDf join prunes), per-query cuts by the
    // same rounded (w DESC, term) boundary
    val mined = timed("mine")(ix.postings.select("doc_id", "term", "tf")
      .join(topDf, "doc_id")
      .join(exclDf, Seq("query_id", "term"), "left_anti")
      .groupBy("query_id", "term")
      .agg(round(sum(col("tf") * col("s1d")), 4).as("w"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("w").desc, col("term"))))
      .filter(col("rk") <= fbTerms)
      .select("query_id", "term", "w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq)
    // per-query normalization on the driver (k-bounded rows)
    val wn = mined.groupBy(_._1).toSeq.flatMap { case (qid, ts) =>
      val sumW = ts.map(_._3).sum
      ts.map { case (_, t, w) =>
        (qid, t, BigDecimal.valueOf(w / sumW)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val noExpansion = queries.map(_._1).toSet -- wn.map(_._1).toSet
    if (wn.isEmpty) {
      // degenerate batch: every query falls back to its pass-1 scores
      // (the blend reads the s1 checkpoint, not the postings slice)
      if (reuseP1) p1post.unpersist(false)
      return TopK.perGroupTopK(
        s1.select(col("query_id"), col("doc_id"), col("s1").as("score"))
          .filter(col("score") > 0),
        "query_id", "doc_id", "score", k)
    }
    val expTerms = wn.map(_._2).distinct
    val stats = ix.idf.select("term", "idf")
      .filter(col("term").isin(expTerms: _*))
    // the r18 fusion: expansion terms that are ALSO pass-1 terms serve
    // from the persisted pass-1 slice (no second at-rest scan of their
    // buckets — these are the corpus-frequent terms with the LONGEST
    // posting lists); only genuinely new terms hit the store, with the
    // usual bucket + term-IN pruning. The union is row-identical to
    // prunedPostings(ix, expTerms): p1post is the knownTerms row set, so
    // filtering it to the overlap yields exactly the overlap terms' rows.
    val knownSet = knownTerms.toSet
    val overlapT = expTerms.filter(knownSet.contains)
    val freshT = expTerms.filterNot(knownSet.contains)
    val esPost =
      if (!reuseP1) Bm25.prunedPostings(ix, expTerms)
      else if (freshT.isEmpty) p1post.filter(col("term").isin(overlapT: _*))
      else if (overlapT.isEmpty) {
        p1post.unpersist(false) // nothing downstream reads it
        Bm25.prunedPostings(ix, freshT)
      } else
        p1post.filter(col("term").isin(overlapT: _*))
          .unionByName(Bm25.prunedPostings(ix, freshT))
    // ── r18 pass-2 restructure (verdict #1): the old plan fanned each
    // expansion-term posting row out to every query weighting that term
    // (a wn-join before the (query_id, doc_id) agg) and then full-outer-
    // joined two |corpus|·|batch|-row sides for the blend — stage
    // attribution put 12-15 s of the 20-s row in exactly those two
    // shuffles. Expansion terms are corpus-FREQUENT (mining weight is
    // relevance-weighted raw tf), so the fan-out multiplied the longest
    // posting lists by the batch size. The restructure treats
    // es(q,d) = Σ_t wn(q,t)·termScore(t,d) as the matrix product it is:
    //  1. per-(term, doc) scores computed ONCE per term (Σ_t df(t) rows —
    //     no query dimension in any shuffle);
    //  2. ONE groupBy(doc_id) collapses them into a per-doc term→score
    //     map (bounded: ≤ |expTerms| ≤ batch·fbTerms entries);
    //  3. the per-query weighting runs MAP-SIDE over a broadcast-literal
    //     (query → (term, wn) pairs) array — k-bounded driver state, the
    //     same rows the mining collect already holds;
    //  4. the blend joins per-DOC maps (|corpus| rows each side, ~20×
    //     smaller than the per-(query, doc) sides) and explodes to the
    //     blended (query_id, doc_id, score) rows map-side.
    // Values are bit-stable at the existing boundaries: term scores sum
    // in pair-list order into the same round-4 cut, and absent terms add
    // an exact +0.0 (t13 entries stay hash-gated).
    // expansion terms get dense INT indexes riding the idf broadcast join
    // (free at ts scale); the per-doc maps below then key on ints, so the
    // per-(doc, query, pair) lookups inside esmCol are int compares, not
    // string compares — measured 2-3× on esDoc at 100× (the lookup count
    // is |pairs|·|doc's expansion terms| per doc)
    val tIdx: Map[String, Int] = expTerms.zipWithIndex.toMap
    val idxDf = tIdx.toSeq.toDF("term", "tidx")
    val ts = esPost
      .join(broadcast(stats.join(idxDf, "term")), "term")
      .select(col("doc_id"), col("tidx"),
        Bm25.termScore(col("tf"), col("doc_len"), lit(ix.avgdl), col("idf"),
          k1, b).as("ts"))
    val wnByQuery: Seq[(Long, Seq[(Int, Double)])] =
      wn.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (qid, ps) => (qid, ps.map(p => (tIdx(p._2), p._3))) }
    val qPairsLit = array(wnByQuery.map { case (qid, ps) =>
      struct(lit(qid).as("qid"),
        array(ps.map { case (t, w) =>
          struct(lit(t).as("t"), lit(w).as("w")) }: _*).as("pairs"))
    }: _*)
    // per-doc query→es map; entries that would not exist in the old
    // per-(query, doc) agg (no expansion-term posting) fall out via the
    // positive filter — a rounded-to-zero es is value-identical to an
    // absent one under the blend's coalesce
    val esmCol = map_from_entries(filter(
      transform(qPairsLit, q => struct(
        q.getField("qid").as("key"),
        round(aggregate(q.getField("pairs"), lit(0.0),
          (acc, p) => acc + coalesce(
            element_at(col("tsm"), p.getField("t")) * p.getField("w"),
            lit(0.0))), 4).as("value"))),
      e => e.getField("value") > 0))
    val esDoc = ts.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("tidx"), col("ts"))))
        .as("tsm"))
      .select(col("doc_id"), esmCol.as("esm"))
      .filter(size(map_keys(col("esm"))) > 0)
    val s1Doc = s1.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("query_id"), col("s1"))))
        .as("s1m"))
    // fine-grained attribution (staged mode only; recomputes, so these
    // overlap the pass2+blend total rather than partitioning it)
    probe.foreach { _ =>
      timed("  esDoc")(esDoc.count()); timed("  s1Doc")(s1Doc.count())
    }
    val emptyQ = lit(Array.empty[Long])
    val s1v = element_at(col("s1m"), col("query_id"))
    val esv = element_at(col("esm"), col("query_id"))
    // same 5-dp blend as [[rm3TopK]]; queries whose expansion came up empty
    // keep score = s1 (the single-query fallback contract)
    val blendCol =
      if (noExpansion.isEmpty)
        round(lit(Lambda) * coalesce(s1v, lit(0.0)) +
          lit(1.0 - Lambda) * coalesce(esv, lit(0.0)), 5)
      else when(col("query_id").isin(noExpansion.toSeq: _*),
          coalesce(s1v, lit(0.0)))
        .otherwise(round(lit(Lambda) * coalesce(s1v, lit(0.0)) +
          lit(1.0 - Lambda) * coalesce(esv, lit(0.0)), 5))
    // bounded-agg per-query top-k (map-side combine, no full sort of the
    // blended score set) — identical (score DESC, doc_id) cut to the
    // row_number window
    TopK.perGroupTopK(
      s1Doc.join(esDoc, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), explode(array_union(
          coalesce(map_keys(col("s1m")), emptyQ),
          coalesce(map_keys(col("esm")), emptyQ))).as("query_id"),
          col("s1m"), col("esm"))
        .select(col("query_id"), col("doc_id"), blendCol.as("score"))
        .filter(col("score") > 0),
      "query_id", "doc_id", "score", k)
  }
}
