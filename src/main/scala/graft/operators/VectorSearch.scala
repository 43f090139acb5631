package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HashAlgos
import graft.functions.VectorFunctions._

/** Vector k-NN over an embeddings table (SURVEY §2.6 T1, §4 ANN ladder).
  *
  * The reference auto-selects a FAISS index by corpus size
  * (`/root/reference/embedding/embed_manager.py:163-213`: Flat → IVFFlat →
  * IVFPQ/HNSW). The Spark-native ladder:
  *
  *  - '''Exact''' ([[bruteTopK]]): cosine score column + `orderBy.limit(k)`
  *    → Catalyst `TakeOrderedAndProject`, a per-partition heap + tiny driver
  *    merge. No shuffle of the corpus; scales linearly and is
  *    embarrassingly parallel — the right default up to ~10^8 vectors per
  *    query batch.
  *  - '''IVF''' ([[IvfIndex]]): KMeans centroids (MLlib, sampled fit), each
  *    vector assigned a `cluster_id` partition column at index-build time.
  *    Query-side: compute the nprobe nearest centroids (driver-side, tiny),
  *    scan ONLY those cluster partitions (partition pruning on disk), exact
  *    re-rank inside. This is FAISS IVFFlat's exact recall/latency trade
  *    re-expressed as parquet partition pruning — at 100 TB the scan touches
  *    nprobe/ncentroids of the data.
  *  - '''PQ / IVFPQ''' ([[pqEncode]]/[[pqAdcTopK]]): 32× compressed codes
  *    scored via a broadcast ADC lookup table, exact re-rank on the
  *    shortlist.
  *  - '''Graph''' ([[knnGraph]]/[[graphSearch]]): the HNSW rung as its
  *    batch analogue — a built-once small-world neighbor graph plus
  *    fixed-hop beam search over a query batch.
  *
  * Batched queries use [[bruteTopKBatch]]: a broadcast join of the query set
  * against the corpus with a per-query `row_number` window — one shuffle of
  * (corpus × queries) scored pairs pre-truncated per partition.
  */
object VectorSearch {

  /** Outcome of the index auto-selection policy ([[chooseIndex]]). */
  sealed abstract class IndexStrategy { def kind: String }
  object IndexStrategy {
    /** Exact scan — small corpora and high-dim vectors (where IVF training
      * degrades and the reference also falls back to flat). */
    final case class Flat(highDim: Boolean) extends IndexStrategy { val kind = "flat" }
    /** Cluster-pruned exact scoring ([[buildIvf]] / [[ivfTopKBatch]]). */
    final case class Ivf(nCentroids: Int) extends IndexStrategy { val kind = "ivf" }
    /** Cluster pruning + PQ-compressed first-pass scoring ([[pqEncode]] /
      * [[pqAdcTopK]] inside probed clusters). */
    final case class IvfPq(nCentroids: Int, subquantizers: Int) extends IndexStrategy { val kind = "ivfpq" }
  }

  /** ANN index auto-selection by corpus size and dimensionality — the
    * reference picks a FAISS index the same way
    * (`/root/reference/embedding/embed_manager.py:163-213`: high-dim > 1536
    * forces flat; < 1000 vectors flat; < 100k IVF with
    * ncentroids = min(4·√n, 256); ≥ 100k IVFPQ with ncentroids capped at
    * 2·256 and min(16, dim/64) subquantizers). The sibling policy at
    * `embedding/index.py:53-92` uses 10k/100k breaks and an HNSW rung for
    * the largest tier; HNSW's graph walk has no efficient DataFrame
    * expression and IVF/IVFPQ covers that regime at cluster scale via
    * partition pruning, so this engine deliberately maps the HNSW tier to
    * IVFPQ (recorded in COVERAGE.md).
    *
    * All thresholds are overridable — the reference reads the same five
    * knobs from KB config.
    */
  def chooseIndex(n: Long, dim: Int,
                  highDimThreshold: Int = 1536,
                  smallThreshold: Int = 1000,
                  mediumThreshold: Int = 100000,
                  centroidMultiplier: Int = 4,
                  maxCentroids: Int = 256): IndexStrategy = {
    import IndexStrategy._
    def centroids(cap: Int): Int =
      math.min((centroidMultiplier * math.sqrt(n.toDouble)).toInt, cap)
    if (dim > highDimThreshold) Flat(highDim = true)
    else if (n < smallThreshold) Flat(highDim = false)
    else if (n < mediumThreshold) Ivf(centroids(maxCentroids))
    else IvfPq(centroids(maxCentroids * 2),
      // the reference computes min(16, dim/64), which is 0 below 64 dims —
      // clamp to ≥1 so PQ stays well-formed for narrow embeddings
      math.max(1, math.min(16, dim / 64)))
  }

  /** Serving-time artifacts for a chosen [[IndexStrategy]] — what
    * `KbPipeline.query`/`queryBatch` dispatch their vector stage on. The
    * reference's policy output IS its serving index
    * (`/root/reference/query/search.py:207-231`: whatever
    * `embed_manager` picked is what search loads and probes), so the
    * auto-selection policy must be able to SERVE every tier it can select.
    * [[buildServing]] is the production constructor (KMeans IVF,
    * Lloyd-trained PQ codebooks); oracle queries construct `Serving` values
    * from the seeded deterministic twins instead, which is what lets the
    * ANN-served e2e pipeline carry a value-exact DuckDB oracle.
    */
  sealed trait Serving
  object Serving {
    /** Exact full-scan vector stage (the `Flat` policy tier). */
    case object Flat extends Serving
    /** Cluster-pruned exact scoring; nprobe comes from config at query
      * time (reference `ivf_nprobe`, `config/models.py:189`). */
    final case class Ivf(index: IvfIndex) extends Serving
    /** Coarse probe → ADC shortlist over PQ codes → exact re-rank of the
      * shortlist (FAISS's IVFPQ+refine recipe). `encoded` is
      * `index.assigned` plus the `codes` column ([[pqEncode]]). */
    final case class IvfPq(index: IvfIndex, cb: PqCodebook, encoded: DataFrame,
                           shortlist: Int = 100) extends Serving
    /** Beam search over a [[knnGraph]] — the HNSW-tier batch analogue.
      * NOTE: plain graph search is recall-fragile on duplicate-heavy
      * corpora (recall ~0.08 at 50× duplication, tools/recall_r10.txt);
      * prefer [[GraphDeduped]] unless the corpus is known-unique. */
    final case class Graph(graph: DataFrame, beam: Int = 64, hops: Int = 3,
                           entryIds: Seq[Long] = Seq(0L)) extends Serving
    /** Duplicate-robust graph tier — the DEFAULT graph serving choice:
      * [[graphSearchDeduped]] builds/searches the kNN graph over the
      * distinct-vector sub-corpus (memoized under `cacheKey`) and expands
      * hits to every copy, holding recall ~0.86 where plain [[Graph]]
      * collapses to ~0.08 on duplicate-saturated corpora. Entry points
      * are the `nEntries` smallest representative ids. */
    final case class GraphDeduped(cacheKey: String, kGraph: Int = 8,
                                  numPlanes: Int = 4, beam: Int = 64,
                                  hops: Int = 3, nEntries: Int = 4)
      extends Serving
  }

  /** Build the serving artifacts for a [[chooseIndex]] outcome — the
    * production path (KMeans coarse quantizer, Lloyd-trained PQ). The
    * reference does exactly this handoff: the index the policy picks is
    * built by `embed_manager` and then loaded by search
    * (`embed_manager.py:163-213` → `query/search.py:207-231`).
    *
    * @param pqCodewords codewords per subspace (FAISS default 256; smaller
    *                    corpora train better with fewer)
    */
  def buildServing(embeddings: DataFrame, idCol: String, vecCol: String,
                   strategy: IndexStrategy, shortlist: Int = 100,
                   pqCodewords: Int = 16): Serving = strategy match {
    case IndexStrategy.Flat(_) => Serving.Flat
    case IndexStrategy.Ivf(nc) =>
      Serving.Ivf(buildIvf(embeddings, idCol, vecCol, nc))
    case IndexStrategy.IvfPq(nc, m) =>
      val ix = buildIvf(embeddings, idCol, vecCol, nc)
      val cb = trainedPqCodebook(embeddings, idCol, vecCol, m, pqCodewords)
      Serving.IvfPq(ix, cb, pqEncode(ix.assigned, idCol, vecCol, cb), shortlist)
  }

  /** Measured outcome of [[tuneServing]]: the chosen quality knobs and the
    * recall@k they achieved on the calibration sample. Knobs that don't
    * apply to the tuned tier are 0. `demotedFrom` is non-empty when the
    * requested tier's ladder exhausted below the recall target and the
    * tuner fell back to a different tier (graph → IVFPQ).
    */
  final case class TunedKnobs(nprobe: Int, shortlist: Int, beam: Int,
                              measuredRecall: Double, entries: Int = 0,
                              hops: Int = 0, demotedFrom: String = "")

  /** Auto-size a tier's quality knobs (IVF `nprobe`, IVFPQ ADC `shortlist`,
    * graph `beam`) to a recall TARGET by calibration, not guesswork: a
    * deterministic hash-ordered sample of corpus vectors becomes the query
    * set, exact ground truth is computed once ([[bruteTopKBatchAgg]]), and
    * the tier's quality ladder is walked cheapest-first until the sampled
    * recall@k reaches the target (ladder exhausted → the best step found).
    * The round-10 sweep showed static defaults sit low on unclustered
    * corpora (IVFPQ 0.29-0.53 at shortlist 20-100, graph 0.24-0.62 at
    * beams 16-64, tools/recall_r10.txt) — the curve SHAPE is corpus
    * geometry, so the knob must be measured per corpus. The reference
    * exposes nprobe as a static config (`query/search.py:222-231`,
    * `faiss_nprobe`); this measures what that knob should be.
    *
    * One-off build-time cost: `nSample` queries × ladder steps, each a
    * small pruned search; ground truth is one batched exact pass. Returns
    * the serving value with the chosen knobs applied (nprobe is a
    * query-time knob — [[Serving.Ivf]] is returned unchanged and the
    * caller sets `ivfNprobe` from the result).
    */
  def tuneServing(embeddings: DataFrame, idCol: String, vecCol: String,
                  serving: Serving, k: Int = 10, recallTarget: Double = 0.9,
                  nSample: Int = 16): (Serving, TunedKnobs) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qs = embeddings
      .orderBy(pmod(col(idCol) * 2654435761L, lit(1000000007L)), col(idCol))
      .limit(nSample)
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
      .localCheckpoint(true)
    def topSet(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id").cast("long"), col("doc_id").cast("long"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (q, xs) => q -> xs.map(_._2).toSet }
    lazy val truth = topSet(bruteTopKBatchAgg(
      embeddings, idCol, vecCol, qs, "query_id", "qvec", k))
    // `excluded`: entry ids of the step under evaluation — a calibration
    // query that IS an entry starts the search at its own answer and
    // scores near-1.0 regardless of coverage, so it is dropped from the
    // average (unless that would drop every query)
    def recallOf(got: Map[Long, Set[Long]],
                 excluded: Set[Long] = Set.empty): Double = {
      val eligible = truth.view.filterKeys(q => !excluded.contains(q)).toMap
      val basis = if (eligible.nonEmpty) eligible else truth
      if (basis.isEmpty) 1.0
      else basis.map { case (q, t) =>
        got.get(q).map(g => (g intersect t).size.toDouble / t.size)
          .getOrElse(0.0) }.sum / basis.size
    }
    // cheapest-first walk with early exit at the target
    def walk[A](steps: Seq[A])(eval: A => Double): (A, Double) = {
      var best = (steps.head, -1.0)
      val it = steps.iterator
      var done = false
      while (it.hasNext && !done) {
        val s = it.next()
        val r = eval(s)
        if (r > best._2) best = (s, r)
        if (r >= recallTarget) done = true
      }
      best
    }
    def doubling(from: Int, to: Int): Seq[Int] =
      (Iterator.iterate(from)(_ * 2).takeWhile(_ < to).toSeq :+ to).distinct
    def beamLadder(k: Int): Seq[Int] = {
      val l = Seq(16, 32, 48, 64, 96, 128).filter(_ >= k)
      if (l.isEmpty) Seq(k) else l
    }
    serving match {
      case Serving.Flat => (serving, TunedKnobs(0, 0, 0, 1.0))
      case Serving.Ivf(ix) =>
        val centDf = ix.centroids.toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) }.toDF("cid", "cv")
          .localCheckpoint(true)
        val (np, r) = walk(doubling(1, ix.centroids.length)) { np =>
          recallOf(topSet(ivfTopKBatch(ix.assigned, ix.idCol, ix.vecCol,
            centDf, qs, "query_id", "qvec", k, np)))
        }
        (serving, TunedKnobs(np, 0, 0, r))
      case Serving.IvfPq(ix, cb, encoded, _) =>
        // shortlist grows first (ADC re-rank is the cheap stage), then the
        // coarse probe widens (more bytes scanned) — increasing-cost order.
        // One batched job per PROBE width, not per (nprobe, shortlist) pair:
        // the widest shortlist's ADC ranking is computed once with exact
        // cosine re-scores attached, and every smaller shortlist is an ADC
        // prefix of it, so its recall derives driver-side for free (the
        // sl=20 result is rows 1-20 of the sl=200 ranking by construction).
        val sample = qs.select("query_id", "qvec").collect()
          .map(row => (row.getLong(0), row.getSeq[Float](1).toSeq)).toSeq
        val slLadder = Seq(2 * k, 5 * k, 10 * k, 20 * k)
        val slMax = slLadder.max
        var best = ((math.min(4, ix.centroids.length), slLadder.head), -1.0)
        val npIt = doubling(math.min(4, ix.centroids.length),
          ix.centroids.length).iterator
        var done = false
        while (npIt.hasNext && !done) {
          val np = npIt.next()
          // qid -> shortlist rows in ADC order, each with its exact score
          val scored = ivfPqAdcScored(encoded, ix.idCol, ix.vecCol, "codes",
            cb, ix.centroids, sample, np, slMax)
            .select(col("query_id").cast("long"), col("doc_id").cast("long"),
              col("rank"), col("score"))
            .collect()
            .groupBy(_.getLong(0))
            .map { case (q, rows) =>
              q -> rows.sortBy(_.getInt(2))
                .map(r => (r.getLong(1), r.getDouble(3))).toSeq }
          val slIt = slLadder.iterator
          while (slIt.hasNext && !done) {
            val sl = slIt.next()
            val got = scored.map { case (q, rows) =>
              q -> rows.take(sl)
                .sortBy { case (d, s) => (-s, d) }.take(k).map(_._1).toSet }
            val r = recallOf(got)
            if (r > best._2) best = ((np, sl), r)
            if (r >= recallTarget) done = true
          }
        }
        val ((np, sl), r) = best
        (Serving.IvfPq(ix, cb, encoded, sl), TunedKnobs(np, sl, 0, r))
      case Serving.Graph(g, _, hops, entries) =>
        // session-scoped synthetic key: the in-memory (vectors, edges)
        // broadcast is built once and shared across ladder steps instead
        // of re-collected per beam value (same economics as the
        // GraphDeduped branch's memoized build)
        val tuneKey = Some(s"tune|${System.identityHashCode(g)}")
        // 3-D ladder: ENTRY COVERAGE × beam × hops. The round-10/11 sweeps
        // showed beams alone saturate well below target on unclustered
        // corpora — a beam search can only reach what its entry points'
        // basins cover, so the tuner widens the start set (and, r12, the
        // hop depth) too. Candidate entries are a hash-spread corpus
        // sample DISJOINT from the calibration queries (entries equal to
        // query ids would start the search at its own answer and fake the
        // recall).
        val base = entries.distinct
        val entryLadder = Seq(8, 16, 32, 64, 96)
        val extra = embeddings
          .orderBy(pmod(col(idCol) * 2654435761L, lit(1000000007L)), col(idCol))
          .limit(nSample + entryLadder.max + 32)
          .select(col(idCol).cast("long")).as[Long].collect().toSeq
          .drop(nSample).filterNot(base.toSet)
        val entrySets = (Seq(base.size) ++ entryLadder.filter(_ > base.size))
          .distinct.map(n => base ++ extra.take(n - base.size))
        // every candidate entry id across the WHOLE ladder is excluded from
        // the calibration basis up front: steps scored over different query
        // subsets are not comparable, and the walk's argmax / early-exit
        // threshold must share one denominator
        val allEntryIds: Set[Long] = entrySets.flatten.toSet
        val hopLadder = Seq(hops, hops + 1, hops + 2).distinct
        val steps = (for {
          es <- entrySets; b <- beamLadder(k); h <- hopLadder
        } yield (es, b, h))
          .sortBy { case (es, b, h) => (es.size.toLong * b * h, b.toLong * h) }
        val ((ents, beam, hp), r) = walk(steps) { case (es, b, h) =>
          recallOf(topSet(graphSearch(g, embeddings, idCol, vecCol,
            qs, "query_id", "qvec", k, b, h, es,
            cacheKey = tuneKey)), excluded = allEntryIds)
        }
        demoteIfBelowTarget(embeddings, idCol, vecCol, k, recallTarget,
          nSample, "graph")(
          (Serving.Graph(g, beam, hp, ents),
            TunedKnobs(0, 0, beam, r, ents.size, hops = hp)))
      case Serving.GraphDeduped(ck, kg, planes, _, hops, nEnt) =>
        // the memoized build under `ck` is shared across ladder steps;
        // same 3-D (entry count × beam × hops) ladder as the plain graph
        // tier, with the exclusion set fixed up front at the ladder's
        // maximum entry count (dedup entry prefixes are nested, so the max
        // prefix IS the union of every step's entries)
        val entryLadder = Seq(8, 16, 32, 64, 96)
        val neLadder = (Seq(nEnt) ++ entryLadder.filter(_ > nEnt)).distinct
        val allEntryIds = dedupEntryIds(embeddings, idCol, vecCol,
          neLadder.max, Some(ck)).toSet
        val hopLadder = Seq(hops, hops + 1, hops + 2).distinct
        val steps = (for { ne <- neLadder; b <- beamLadder(k); h <- hopLadder }
          yield (ne, b, h))
          .sortBy { case (ne, b, h) => (ne.toLong * b * h, b.toLong * h) }
        val ((ne, beam, hp), r) = walk(steps) { case (ne, b, h) =>
          recallOf(topSet(graphSearchDeduped(embeddings, idCol, vecCol,
            qs, "query_id", "qvec", k, kg, planes, b, h, ne, Some(ck))),
            excluded = allEntryIds)
        }
        demoteIfBelowTarget(embeddings, idCol, vecCol, k, recallTarget,
          nSample, "graphDeduped")(
          (Serving.GraphDeduped(ck, kg, planes, beam, hp, ne),
            TunedKnobs(0, 0, beam, r, ne, hops = hp)))
    }
  }

  /** Recorded tier demotion: when a graph tier's quality ladder exhausts
    * below the recall target, fall back to a freshly built-and-tuned IVFPQ
    * tier (which holds recall 1.0 at 50× in the sweep record) — the same
    * auto-selection economics as the reference's index policy
    * (`/root/reference/embedding/embed_manager.py:163-213`: the manager
    * picks the index FAMILY, not just its knobs). The demotion is taken
    * only if the demoted tier actually measures better; the outcome is
    * recorded in `TunedKnobs.demotedFrom` so callers can log/persist the
    * tier switch.
    */
  private def demoteIfBelowTarget(embeddings: DataFrame, idCol: String,
                                  vecCol: String, k: Int,
                                  recallTarget: Double, nSample: Int,
                                  fromTier: String)(
      tuned: (Serving, TunedKnobs)): (Serving, TunedKnobs) = {
    val (_, knobs) = tuned
    if (knobs.measuredRecall >= recallTarget) tuned
    else {
      val n = embeddings.count()
      val dim = embeddings.select(col(vecCol)).head.getSeq[Float](0).length
      val nc = math.max(2, math.min(
        (4 * math.sqrt(n.toDouble)).toInt, 512))
      val m = math.max(1, math.min(16, dim / 64))
      val built = buildServing(embeddings, idCol, vecCol,
        IndexStrategy.IvfPq(nc, m))
      val (srv, kn) = tuneServing(embeddings, idCol, vecCol, built, k,
        recallTarget, nSample)
      if (kn.measuredRecall > knobs.measuredRecall)
        (srv, kn.copy(demotedFrom = fromTier))
      else tuned
    }
  }

  /** [[buildServing]] + [[tuneServing]]: build the chosen tier, then
    * calibrate its quality knobs to `recallTarget` on the corpus itself.
    */
  def buildServingTuned(embeddings: DataFrame, idCol: String, vecCol: String,
                        strategy: IndexStrategy, recallTarget: Double,
                        k: Int = 10, nSample: Int = 16,
                        pqCodewords: Int = 16): (Serving, TunedKnobs) =
    tuneServing(embeddings, idCol, vecCol,
      buildServing(embeddings, idCol, vecCol, strategy, pqCodewords = pqCodewords),
      k, recallTarget, nSample)

  /** Memoized [[buildServing]] per corpus — build-once/serve-many for the
    * IvfPq tier, exactly like [[cachedIvf]]/[[cachedGraph]]: a CLI query
    * must never pay KMeans + Lloyd codebook training per invocation. The
    * probed table (`encoded`) is persisted; IVF/Flat outcomes delegate to
    * the existing per-tier caches.
    */
  private val servingCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Serving]]()
  def cachedServing(key: String, embeddings: => DataFrame, idCol: String,
                    vecCol: String, strategy: IndexStrategy,
                    shortlist: Int = 100, pqCodewords: Int = 16): Serving =
    strategy match {
      case IndexStrategy.Flat(_) => Serving.Flat
      case IndexStrategy.Ivf(nc) =>
        Serving.Ivf(cachedIvf(key, embeddings, idCol, vecCol, nc))
      case IndexStrategy.IvfPq(nc, m) =>
        val e = embeddings // weak session keying: see Bm25.cachedIndex
        val perSession = servingCache.synchronized {
          servingCache.computeIfAbsent(e.sparkSession,
            _ => new java.util.concurrent.ConcurrentHashMap[String, Serving]())
        }
        // every BUILD parameter is part of the cache key — a re-ingested
        // corpus whose chooseIndex outcome changes (more centroids /
        // subquantizers) must never be served another configuration's stale
        // centroids/codebook (cachedGraph keys on |k=..|p=.. for the same
        // reason). `shortlist` is a SERVING knob, not a build input: two
        // callers differing only in shortlist share one trained index and
        // one persisted encoded table via copy.
        val cacheKey = s"$key|nc=$nc|m=$m|cw=$pqCodewords"
        val cached = perSession.computeIfAbsent(cacheKey, _ =>
          buildServing(e, idCol, vecCol, strategy, shortlist, pqCodewords) match {
            case Serving.IvfPq(ix, cb, encoded, sl) => Serving.IvfPq(ix, cb,
              encoded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), sl)
            case other => other
          })
        cached match {
          case s: Serving.IvfPq if s.shortlist != shortlist =>
            s.copy(shortlist = shortlist)
          case other => other
        }
    }

  /** (id BIGINT, vec ARRAY&lt;FLOAT&gt;) — the schema the in-memory serving
    * fast paths require; anything else falls through to the distributed
    * plan unchanged.
    */
  private def isLongArrayF32(df: DataFrame, id: String, vec: String): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    df.schema(id).dataType == LongType &&
      (df.schema(vec).dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
  }

  /** Hard byte budget for any in-memory vector collect: rows × dim must
    * stay under this many floats (64M ≈ 256 MB of payload) regardless of
    * the row limit — a 1536-d corpus under 200k ROWS would otherwise
    * collect ~1 GB to the driver that the distributed plan never
    * materializes. The dim probe is one `take(1)` inside the memoized
    * build.
    */
  private val InMemMaxFloats = 64L * 1024 * 1024

  /** Guarded in-memory corpus for the flat-tier serving fast path: when the
    * embeddings table fits under `inMemoryLimit` rows (LIMIT-bounded count,
    * the [[graft.operators.Dedup]] broadcast-guard pattern) AND under the
    * [[InMemMaxFloats]] byte budget, its (id, vec) pairs are collected ONCE
    * and broadcast — the reference's in-process FAISS `IndexFlat` serving
    * regime (`embed_manager.py:163-213` picks flat exactly when the corpus
    * is small). REQUIRES a `cacheKey` (build-once serve-many is the whole
    * economics; a keyless caller would pay count+collect+broadcast per
    * call with zero reuse — the distributed plan is strictly better
    * there). Null-vector rows are dropped at collect: they can never rank
    * (the window plan sorts null scores last, under any real top-k), and
    * the in-memory loop must not NPE where the plan degrades. Above
    * either limit — the 100 TB regime — `None`, and callers keep their
    * distributed plan unchanged.
    */
  private type InMemCorpus =
    org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Float])]]
  private val inMemCorpusCache = new SessionMemo[Option[InMemCorpus]]
  private def corpusInMemory(embeddings: DataFrame, idCol: String,
                             vecCol: String, inMemoryLimit: Int,
                             cacheKey: Option[String]): Option[InMemCorpus] = {
    if (inMemoryLimit <= 0) return None
    if (!isLongArrayF32(embeddings, idCol, vecCol)) return None
    val spark = embeddings.sparkSession
    import spark.implicits._
    cacheKey.flatMap { k0 =>
      inMemCorpusCache.getOrBuild(spark, s"$k0|lim=$inMemoryLimit") {
        val emb = embeddings.select(col(idCol), col(vecCol))
          .filter(col(vecCol).isNotNull)
        val n = emb.limit(inMemoryLimit + 1).count()
        val dim = emb.select(size(col(vecCol))).take(1)
          .headOption.map(_.getInt(0).toLong).getOrElse(0L)
        if (n > inMemoryLimit || n * math.max(dim, 1L) > InMemMaxFloats) None
        else Some(spark.sparkContext.broadcast(emb.as[(Long, Array[Float])].collect()))
      }
    }
  }

  /** Query vectors drawn from the ALREADY-RESIDENT in-memory corpus with
    * zero jobs: when [[corpusInMemory]] holds the table (memoized
    * broadcast under the same key the search path uses), filtering the
    * broadcast value driver-side replaces a per-call parquet scan job for
    * the query rows — and because the result is a `Seq.toDF`
    * LocalRelation, [[searchQuerySet]]'s driver path answers the whole
    * batch search in process (the reference's resident-index serving
    * regime, where the client hands query vectors to a loaded FAISS index
    * without a storage round-trip, `query/search.py:207-231`). None when
    * the corpus isn't resident (over-limit / keyless / off-schema) or the
    * predicate matches more than `maxQueries` rows — callers keep their
    * distributed query scan, so the 100 TB path is unchanged. Rows come
    * back sorted by id: the broadcast array order is a collect order, not
    * a contract.
    */
  def corpusQueriesInMemory(embeddings: DataFrame, idCol: String,
                            vecCol: String, pred: Long => Boolean,
                            qidCol: String, qvecCol: String,
                            maxQueries: Int = 1024,
                            inMemoryLimit: Int = 200000,
                            cacheKey: Option[String] = None): Option[DataFrame] =
    corpusInMemory(embeddings, idCol, vecCol, inMemoryLimit, cacheKey).flatMap { bc =>
      val spark = embeddings.sparkSession
      import spark.implicits._
      val qs = bc.value.iterator.filter { case (id, _) => pred(id) }.toArray
      if (qs.length > maxQueries) None
      else Some(qs.sortBy(_._1).toSeq.toDF(qidCol, qvecCol))
    }

  /** The raw driver-side twin of [[corpusQueriesInMemory]]: matching
    * (id, vec) pairs off the resident broadcast, id-sorted, as immutable
    * Seqs — for callers that need driver values (centroid seeds, a single
    * query vector) rather than a DataFrame. Same residency/limit contract.
    */
  def corpusVectorsInMemory(embeddings: DataFrame, idCol: String,
                            vecCol: String, pred: Long => Boolean,
                            maxRows: Int = 1024,
                            inMemoryLimit: Int = 200000,
                            cacheKey: Option[String] = None): Option[Seq[(Long, Seq[Float])]] =
    corpusInMemory(embeddings, idCol, vecCol, inMemoryLimit, cacheKey).flatMap { bc =>
      val xs = bc.value.iterator.filter { case (id, _) => pred(id) }.toArray
      if (xs.length > maxRows) None
      else Some(xs.sortBy(_._1).toSeq.map { case (id, v) =>
        (id, scala.collection.immutable.ArraySeq.unsafeWrapArray(v): Seq[Float]) })
    }

  /** One corpus vector fetched from the resident broadcast (zero jobs) —
    * the single-query twin of [[corpusQueriesInMemory]], replacing a
    * per-call `.first()` job. None when the corpus isn't resident or the
    * id is absent/null-vectored; callers fall back to the scan.
    */
  def corpusVectorInMemory(embeddings: DataFrame, idCol: String,
                           vecCol: String, id: Long,
                           inMemoryLimit: Int = 200000,
                           cacheKey: Option[String] = None): Option[Seq[Float]] =
    corpusVectorsInMemory(embeddings, idCol, vecCol, _ == id, maxRows = 1,
      inMemoryLimit = inMemoryLimit, cacheKey = cacheKey)
      .flatMap(_.headOption.map(_._2))

  /** Replay the [[TopKAggregator]] over an in-memory corpus for one query —
    * the SAME insertion/ordering semantics (score desc, doc_id asc,
    * primitive comparisons) and the SAME [[HashAlgos.cosineF32]] arithmetic
    * order as the distributed paths, so either path is bit-identical.
    * `scoreFn` is the per-score transform hook (identity for the raw
    * ranking contract; [[roundAt]] for the pipeline's rounded contract).
    */
  private def roundAt(scale: Int)(x: Double): Double =
    graft.functions.HashAlgos.roundHalfUp(x, scale)
  private def topKOverCorpus(corpus: Array[(Long, Array[Float])],
                             qv: Array[Float], k: Int,
                             scoreFn: Double => Double = identity): Seq[ScoredDoc] = {
    val agg = new TopKAggregator(k)
    var b = agg.zero
    var i = 0
    while (i < corpus.length) {
      val (id, v) = corpus(i)
      b = agg.reduce(b, ScoredDoc(id, scoreFn(HashAlgos.cosineF32(v, qv))))
      i += 1
    }
    b.items
  }

  /** [[topKOverCorpus]] under the pipeline's rounded ranking, with the
    * BigDecimal HALF_UP rounding applied ONLY to heap candidates: a row
    * whose raw cosine sits more than one 10^-scale below the current k-th
    * ROUNDED score cannot round into the heap (|round(x) − x| ≤
    * 0.5·10^-scale), so cold rows cost one double compare instead of a
    * per-row BigDecimal allocation — the difference between ~0.1 s and
    * multiple seconds on a 100k-vector warm batch. Results are identical
    * to rounding every row (the prune is a strict under-bound; candidates
    * still go through the exact Spark-round twin).
    */
  private def roundedTopKOverCorpus(corpus: Array[(Long, Array[Float])],
                                    qv: Array[Float], k: Int,
                                    scale: Int): Seq[ScoredDoc] = {
    val agg = new TopKAggregator(k)
    var b = agg.zero
    val band = math.pow(10.0, -scale)
    val round: Double => Double = roundAt(scale)(_)
    var i = 0
    while (i < corpus.length) {
      val (id, v) = corpus(i)
      val raw = HashAlgos.cosineF32(v, qv)
      if (b.items.length < k || raw >= b.items.last.score - band)
        b = agg.reduce(b, ScoredDoc(id, round(raw)))
      i += 1
    }
    b.items
  }

  /** Exact top-k for one literal query vector.
    *
    * Serving shape: under `inMemoryLimit` rows (see [[corpusInMemory]]) the
    * scan + heap run driver-side over the memoized broadcast value and the
    * result is a LocalRelation — with a `cacheKey` a warm single-vector
    * search issues ZERO scan jobs, the reference's in-process `IndexFlat`
    * latency regime (BASELINE.md's 1.24 ms/query is FAISS in-process; the
    * distributed plan pays a per-job scheduling floor ~100× that). Results
    * are identical on either path (spec-proved); `inMemoryLimit = 0`
    * forces the distributed `TakeOrderedAndProject` plan, which is also
    * what any corpus above the limit uses — at 100 TB nothing changes.
    */
  def bruteTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                query: Seq[Float], k: Int, inMemoryLimit: Int = 200000,
                cacheKey: Option[String] = None): DataFrame =
    corpusInMemory(embeddings, idCol, vecCol, inMemoryLimit, cacheKey) match {
      case Some(bc) =>
        val spark = embeddings.sparkSession
        import spark.implicits._
        topKOverCorpus(bc.value, query.toArray, k)
          .map(sd => (sd.doc_id, sd.score)).toDF("doc_id", "score")
      case None =>
        embeddings
          .select(col(idCol).as("doc_id"),
            cosine(col(vecCol), vecLit(query)).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(k)
    }

  /** The one-stage in-memory batch path shared by [[bruteTopKBatch]] and
    * [[bruteTopKBatchAgg]]: one mapPartitions over the (distributed) query
    * set against the broadcast corpus. None when the corpus exceeds the
    * limit or the column types don't fit the fast path.
    */
  private def bruteTopKBatchInMemory(embeddings: DataFrame, idCol: String,
                                     vecCol: String, queries: DataFrame,
                                     qidCol: String, qvecCol: String, k: Int,
                                     inMemoryLimit: Int,
                                     cacheKey: Option[String]): Option[DataFrame] = {
    if (!isLongArrayF32(queries, qidCol, qvecCol)) return None
    corpusInMemory(embeddings, idCol, vecCol, inMemoryLimit, cacheKey).flatMap { bc =>
      val kk = k
      // a LARGE in-memory corpus makes each query's scan the unit of work;
      // a storage-resident query set often lands in 1-2 input partitions,
      // serializing the whole batch on one core — spread it (per-query
      // search is independent, so repartition changes nothing but
      // parallelism; one tiny shuffle of the ≤1024-row query set)
      val spreadQueries = bc.value.length >= 8192
      searchQuerySet(queries, qidCol, qvecCol, spread = spreadQueries) { (qid, qv) =>
        topKOverCorpus(bc.value, qv, kk).iterator.zipWithIndex.map {
          case (sd, i) => (qid, sd.doc_id, sd.score, i + 1)
        }
      }
    }
  }

  /** Run a per-query in-memory search function over a query set, choosing
    * the cheapest execution shape: a DRIVER-BUILT small query batch (a
    * Seq.toDF of embedded query vectors — the pipeline's serving shape)
    * constant-folds to a LocalRelation, recognizable from the optimized
    * plan with NO job; answering it driver-side makes the whole search
    * ZERO jobs and the result a LocalRelation — true in-process serving
    * latency. Query sets that live in storage (or are large) run one fused
    * scan+search mapPartitions stage — collecting them first would cost
    * more jobs than it saves (measured: CollectLimit's incremental scan
    * added a job per call). `search` must only touch broadcast values, so
    * the same closure is correct on the driver and inside the stage.
    */
  private def searchQuerySet(queries: DataFrame, qidCol: String, qvecCol: String,
                             spread: Boolean = false)
                            (search: (Long, Array[Float]) => Iterator[(Long, Long, Double, Int)]): Option[DataFrame] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val sel = queries.select(col(qidCol), col(qvecCol))
    val qLimit = 1024
    val localRows: Option[Seq[(Long, Array[Float])]] =
      sel.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
            if lr.data.length <= qLimit =>
          scala.util.Try(lr.data.map { r =>
            (r.getLong(0), r.getArray(1).toFloatArray())
          }).toOption
        case _ => None
      }
    Some(localRows match {
      case Some(qRows) =>
        qRows.flatMap { case (qid, qv) => search(qid, qv) }
          .toDF("query_id", "doc_id", "score", "rank")
      case None =>
        val ds = sel.as[(Long, Array[Float])]
        val shaped =
          if (spread) ds.repartition(spark.sparkContext.defaultParallelism)
          else ds
        shaped
          .mapPartitions(_.flatMap { case (qid, qv) => search(qid, qv) })
          .toDF("query_id", "doc_id", "score", "rank")
    })
  }

  /** Driver-side exact top-k over the guarded in-memory corpus with the
    * PIPELINE's ranking contract: scores rounded (HALF_UP, `scale` dp —
    * identical to Spark's `round(col, scale)`) BEFORE ranking, ties to the
    * lowest doc_id — the determinism contract every KbPipeline top-k
    * boundary uses. Query vectors are already driver-held in the pipeline
    * (they come from the query embedder), so a hit on the memoized corpus
    * broadcast answers the whole vector stage with ZERO jobs and hands
    * downstream joins a LocalRelation — the reference's in-process
    * SQLite+FAISS serving shape (`query/search.py:207-231`). None above
    * the limit (or on a non-(BIGINT, ARRAY&lt;FLOAT&gt;) corpus): callers
    * keep their distributed plan — at 100 TB nothing changes.
    */
  def roundedTopKInProcess(embeddings: DataFrame, idCol: String, vecCol: String,
                           queries: Seq[(Long, Array[Float])], k: Int,
                           scale: Int, inMemoryLimit: Int = 200000,
                           cacheKey: Option[String] = None): Option[DataFrame] =
    corpusInMemory(embeddings, idCol, vecCol, inMemoryLimit, cacheKey).map { bc =>
      val spark = embeddings.sparkSession
      import spark.implicits._
      queries.flatMap { case (qid, qv) =>
        roundedTopKOverCorpus(bc.value, qv, k, scale)
          .map(sd => (qid, sd.doc_id, sd.score))
      }.toDF("query_id", "doc_id", "score")
    }

  /** [[roundedTopKInProcess]] as VALUES — the ranked `(doc_id, rounded
    * score)` list for ONE query, for callers composing further driver-side
    * stages (the fully in-process pipeline serving path) instead of a
    * LocalRelation. Same guard, memoized broadcast, and rounded ranking
    * contract; None keeps the caller on its distributed plan.
    */
  def roundedTopKValues(embeddings: DataFrame, idCol: String, vecCol: String,
                        qv: Array[Float], k: Int, scale: Int,
                        inMemoryLimit: Int = 200000,
                        cacheKey: Option[String] = None): Option[Seq[(Long, Double)]] =
    corpusInMemory(embeddings, idCol, vecCol, inMemoryLimit, cacheKey).map { bc =>
      roundedTopKOverCorpus(bc.value, qv, k, scale)
        .map(sd => (sd.doc_id, sd.score))
    }

  /** Exact top-k for a batch of queries `(query_id, qvec)`.
    * Broadcast the (small) query set; per-partition partial top-k via the
    * rank window happens after one shuffle on query_id.
    *
    * Serving shape: under `inMemoryLimit` corpus rows the whole batch runs
    * as ONE mapPartitions over the queries against the broadcast corpus
    * ([[corpusInMemory]]) — the reference's in-process flat-index regime
    * (50 queries × top-20 in ~62 ms, BASELINE.md), which the multi-stage
    * distributed plan can never reach through its per-stage scheduling
    * floor. Identical results on either path (spec-proved);
    * `inMemoryLimit = 0` forces the distributed plan, which corpora above
    * the limit use unconditionally — the 100 TB path is unchanged.
    */
  def bruteTopKBatch(embeddings: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int, inMemoryLimit: Int = 200000,
                     cacheKey: Option[String] = None): DataFrame =
    bruteTopKBatchInMemory(embeddings, idCol, vecCol, queries, qidCol,
      qvecCol, k, inMemoryLimit, cacheKey).getOrElse {
      val scored = embeddings.crossJoin(broadcast(queries))
        .select(col(qidCol).as("query_id"), col(idCol).as("doc_id"),
          cosine(col(vecCol), col(qvecCol)).as("score"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= k)
    }

  /** Batched exact top-k via the bounded [[TopKAggregator]] — same results
    * as [[bruteTopKBatch]], but only k rows per partition per query reach
    * the shuffle (map-side combine) instead of every scored pair. The
    * preferred form at large corpus × many queries.
    */
  def bruteTopKBatchAgg(embeddings: DataFrame, idCol: String, vecCol: String,
                        queries: DataFrame, qidCol: String, qvecCol: String,
                        k: Int, inMemoryLimit: Int = 200000,
                        cacheKey: Option[String] = None): DataFrame =
    bruteTopKBatchInMemory(embeddings, idCol, vecCol, queries, qidCol,
      qvecCol, k, inMemoryLimit, cacheKey).getOrElse {
      val scored = embeddings.crossJoin(broadcast(queries))
        .select(col(qidCol).as("query_id"), col(idCol).as("doc_id"),
          cosine(col(vecCol), col(qvecCol)).as("score"))
      TopK.explodeRanked(
        scored.groupBy("query_id")
          .agg(TopK.topK(k)(col("doc_id"), col("score")).as("tk")),
        "tk", Seq("query_id"))
    }

  /** IVF-style index: centroids + cluster assignment.
    *
    * @param assigned  embeddings with an extra `cluster_id` column — write
    *                  this partitioned by `cluster_id` for pruning at rest
    * @param centroids local centroid vectors (ncentroids × dim), tiny
    */
  final case class IvfIndex(assigned: DataFrame, centroids: Array[Array[Float]],
                            idCol: String, vecCol: String,
                            cacheKey: Option[String] = None)

  /** Guarded in-memory IVF corpus for the serving fast path: the cluster
    * assignment collected ONCE (LIMIT-bounded count, memoized per
    * (session, key)) and grouped by cluster_id — FAISS IVFFlat's resident
    * serving layout. None over the limit or off-schema; the partition-
    * pruned distributed scan is the 100 TB path either way.
    */
  private type InMemIvf = org.apache.spark.broadcast.Broadcast[
    (Array[(Int, Array[Float])], Map[Int, Array[(Long, Array[Float])]])]
  private val inMemIvfCache = new SessionMemo[Option[InMemIvf]]
  private def ivfInMemory(assigned: DataFrame, idCol: String, vecCol: String,
                          cents: => Array[(Int, Array[Float])],
                          inMemoryLimit: Int,
                          cacheKey: Option[String]): Option[InMemIvf] = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    if (inMemoryLimit <= 0) return None
    if (!isLongArrayF32(assigned, idCol, vecCol)) return None
    val cidType = assigned.schema("cluster_id").dataType
    if (cidType != IntegerType && cidType != LongType) return None
    val spark = assigned.sparkSession
    import spark.implicits._
    // `cents` is by-name and only forced inside the memoized build, so a
    // warm call (or an over-limit index memoized to None) never pays the
    // centroid collect; a failing collect degrades to the distributed plan
    cacheKey.flatMap { k0 =>
      inMemIvfCache.getOrBuild(spark, s"$k0|lim=$inMemoryLimit") {
        scala.util.Try {
          val a = assigned.select(col(idCol), col(vecCol),
              col("cluster_id").cast("int"))
            .filter(col(vecCol).isNotNull)
          val n = a.limit(inMemoryLimit + 1).count()
          val dim = a.select(size(col(vecCol))).take(1)
            .headOption.map(_.getInt(0).toLong).getOrElse(0L)
          if (n > inMemoryLimit || n * math.max(dim, 1L) > InMemMaxFloats) None
          else {
            val byCluster = a.as[(Long, Array[Float], Int)].collect()
              .groupBy(_._3).map { case (cid, xs) => cid -> xs.map(x => (x._1, x._2)) }
            Some(spark.sparkContext.broadcast((cents, byCluster)))
          }
        }.toOption.flatten
      }
    }
  }

  /** Probe selection over driver-held (cid, centroid) pairs — the SAME
    * ranking as the distributed probe windows (raw cosine desc, centroid
    * id asc), zero jobs. Uses a TOTAL ordering (sortBy, NaN-safe like
    * [[probeClusters]]'s sortBy) rather than a hand-rolled primitive
    * comparator — an intransitive comparator over NaN scores can make
    * TimSort throw; on NaN-free input (cosineF32 guards its only 0/0
    * case) the two are identical.
    */
  private def probeInMemory(cents: Array[(Int, Array[Float])], qv: Array[Float],
                            nprobe: Int): Seq[Int] =
    cents.toIndexedSeq
      .map { case (cid, cv) => (cid, HashAlgos.cosineF32(cv, qv)) }
      .sortBy { case (cid, s) => (-s, cid) }
      .take(nprobe).map(_._1)

  /** [[probeInMemory]] over a plain centroid array (cid = position) — the
    * driver twin of the batch probe windows' expression ranking (the
    * `cosine` expression and [[HashAlgos.cosineF32]] share one arithmetic
    * order). NOTE: [[probeClusters]] ranks with float-accumulation cosine
    * — a single-query pipeline caller must keep using it for exact parity
    * with [[probeScan]]; this twin is for the expression-ranked paths.
    */
  def probeIdsInMemory(centroids: Array[Array[Float]], qv: Array[Float],
                       nprobe: Int): Seq[Int] =
    probeInMemory(centroids.zipWithIndex.map { case (cv, cid) => (cid, cv) },
      qv, nprobe)

  /** Driver-side IVF top-k with the PIPELINE's rounded ranking contract
    * (HALF_UP `scale` dp before ranking) — the Serving.Ivf analogue of
    * [[roundedTopKInProcess]]. Each query carries ITS OWN probe list so
    * the caller keeps the probe ranking of the distributed path it
    * replaces ([[probeClusters]] for the single-query pipeline,
    * [[probeIdsInMemory]] for the expression-ranked batch). Requires a
    * KEYED index ([[cachedIvf]]) so the assignment collect is build-once;
    * None otherwise.
    */
  def roundedIvfTopKInProcess(ix: IvfIndex,
                              queries: Seq[(Long, Array[Float], Seq[Int])],
                              k: Int, scale: Int,
                              inMemoryLimit: Int = 200000): Option[DataFrame] =
    ix.cacheKey.flatMap(_ =>
      ivfInMemory(ix.assigned, ix.idCol, ix.vecCol,
        ix.centroids.zipWithIndex.map { case (cv, cid) => (cid, cv) },
        inMemoryLimit, ix.cacheKey))
      .map { bc =>
        val spark = ix.assigned.sparkSession
        import spark.implicits._
        queries.flatMap { case (qid, qv, probes) =>
          val (_, clusters) = bc.value
          val agg = new TopKAggregator(k)
          var b = agg.zero
          probes.foreach { cid =>
            clusters.getOrElse(cid, Array.empty[(Long, Array[Float])]).foreach {
              case (id, v) =>
                b = agg.reduce(b, ScoredDoc(id,
                  roundAt(scale)(HashAlgos.cosineF32(v, qv))))
            }
          }
          b.items.map(sd => (qid, sd.doc_id, sd.score))
        }.toDF("query_id", "doc_id", "score")
      }

  /** Resident PQ serving state: (cluster → sorted array of (id, codes,
    * raw vector)) for a KEYED encoded table under the row/float budget —
    * FAISS IVFPQ's loaded-index layout (codes for the ADC scan, raw
    * vectors for the refine step). Memoized per (session, key); None
    * keeps callers on the partition-pruned distributed plan, the 100 TB
    * path.
    */
  private type InMemPq =
    org.apache.spark.broadcast.Broadcast[Map[Int, Array[(Long, Array[Int], Array[Float])]]]
  private val inMemPqCache = new SessionMemo[Option[InMemPq]]
  private def pqInMemory(encoded: DataFrame, idCol: String, vecCol: String,
                         inMemoryLimit: Int,
                         cacheKey: Option[String]): Option[InMemPq] = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    if (inMemoryLimit <= 0) return None
    if (!isLongArrayF32(encoded, idCol, vecCol)) return None
    val cidType = encoded.schema("cluster_id").dataType
    if (cidType != IntegerType && cidType != LongType) return None
    val spark = encoded.sparkSession
    import spark.implicits._
    cacheKey.flatMap { k0 =>
      inMemPqCache.getOrBuild(spark, s"$k0|pq|lim=$inMemoryLimit") {
        scala.util.Try {
          val sel = encoded.select(col(idCol), col("cluster_id").cast("int"),
              col("codes"), col(vecCol))
            .filter(col(vecCol).isNotNull && col("codes").isNotNull)
          val n = sel.limit(inMemoryLimit + 1).count()
          val dim = sel.select(size(col(vecCol))).take(1)
            .headOption.map(_.getInt(0).toLong).getOrElse(0L)
          if (n > inMemoryLimit || n * math.max(dim, 1L) > InMemMaxFloats) None
          else Some(spark.sparkContext.broadcast(
            sel.as[(Long, Int, Array[Int], Array[Float])].collect()
              .groupBy(_._2)
              .map { case (cid, xs) =>
                cid -> xs.sortBy(_._1).map(x => (x._1, x._3, x._4)) }))
        }.toOption.flatten
      }
    }
  }

  /** In-process single-query IVFPQ+refine under the pipeline's rounded
    * ranking: ADC over the resident probed clusters' codes (negated
    * round-6 dist desc ≡ dist asc, id asc — [[pqAdcTopK]]'s order) keeps a
    * `shortlist`, then the exact rounded-cosine re-rank runs over the SAME
    * resident rows' raw vectors — zero scheduled jobs warm, the FAISS
    * resident-IVFPQ regime. The caller supplies the probe list so the
    * distributed path's probe ranking is preserved verbatim. None
    * (keyless / over-budget / off-schema) keeps the distributed plan.
    */
  def ivfPqTopKValues(encoded: DataFrame, idCol: String, vecCol: String,
                      cb: PqCodebook, qv: Array[Float], probes: Seq[Int],
                      k: Int, shortlist: Int, scale: Int = 6,
                      inMemoryLimit: Int = 200000,
                      cacheKey: Option[String] = None): Option[Seq[(Long, Double)]] =
    pqInMemory(encoded, idCol, vecCol, inMemoryLimit, cacheKey).map { bc =>
      val lut = pqLut(cb, qv.toSeq)
      val kSub = cb.head.length
      // ADC stage: same accumulation order as PqAdcDistColsExpr (sequential
      // s = 0..m-1), negated round-6 so TopKAggregator's (score desc, id)
      // equals (dist asc, id)
      val adcAgg = new TopKAggregator(shortlist)
      var sb = adcAgg.zero
      probes.foreach { cid =>
        bc.value.getOrElse(cid, Array.empty[(Long, Array[Int], Array[Float])])
          .foreach { case (id, codes, _) =>
            var acc = 0.0
            var s = 0
            while (s < codes.length) {
              acc = acc + lut(s * kSub + codes(s))
              s += 1
            }
            sb = adcAgg.reduce(sb,
              ScoredDoc(id, -graft.functions.HashAlgos.roundHalfUp(acc, 6)))
          }
      }
      val short = sb.items.map(_.doc_id).toSet
      // refine: exact rounded cosine over the shortlist's raw vectors
      val agg = new TopKAggregator(k)
      var b = agg.zero
      probes.foreach { cid =>
        bc.value.getOrElse(cid, Array.empty[(Long, Array[Int], Array[Float])])
          .foreach { case (id, _, v) =>
            if (short.contains(id))
              b = agg.reduce(b, ScoredDoc(id,
                graft.functions.HashAlgos.roundHalfUp(
                  graft.functions.HashAlgos.cosineF32(v, qv), scale)))
          }
      }
      b.items.map(sd => (sd.doc_id, sd.score))
    }

  /** Build an IVF index with MLlib KMeans fit on a sample (the reference
    * trains on ≤10k vectors, `embed_manager.py:694-715`; ncentroids ≈ 4·√n
    * capped — `embed_manager.py:163-213`).
    */
  def buildIvf(embeddings: DataFrame, idCol: String, vecCol: String,
               nCentroids: Int, seed: Long = 42L, sampleCap: Int = 10000): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = embeddings.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val n = featured.count()
    val sample = if (n > sampleCap) featured.sample(withReplacement = false, sampleCap.toDouble / n, seed) else featured
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(20).fit(sample)
    val assigned = model.transform(featured)
      .select(col(idCol), col(vecCol), col(model.getPredictionCol).as("cluster_id"))
    IvfIndex(assigned, model.clusterCenters.map(_.toArray.map(_.toFloat)), idCol, vecCol)
  }

  /** Persist an IVF index AT REST: `assigned` partitioned by
    * `cluster_id` — the probe's cluster filter prunes whole files before
    * any row is read — plus the centroids as a tiny sidecar table. This
    * is the FAISS index-FILE analogue (the reference persists `.faiss`
    * sidecars and reloads them per process, `embedding/index.py`); here
    * the artifact is a table any executor can scan, built once by the
    * `ivf` CLI verb and served by `query` without re-clustering.
    */
  def writeIvf(ix: IvfIndex, dir: String,
               sourceFingerprint: Option[Long] = None): Unit = {
    ix.assigned.write.mode("overwrite").partitionBy("cluster_id")
      .parquet(s"$dir/assigned")
    val spark = ix.assigned.sparkSession
    import spark.implicits._
    ix.centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cluster_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    // staleness sidecar: the fingerprint of the SOURCE embeddings the
    // index was built from — query-time loads compare it to the current
    // embeddings and fall back to a rebuild on mismatch, instead of
    // silently missing vectors appended after the build
    sourceFingerprint.foreach(fp =>
      Seq(Tuple1(fp)).toDF("source_fp")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta"))
  }

  /** The `source_fp` recorded by [[writeIvf]], if the store has one. */
  def readIvfSourceFp(spark: org.apache.spark.sql.SparkSession,
                      dir: String): Option[Long] =
    scala.util.Try(
      spark.read.parquet(s"$dir/meta").select("source_fp")
        .head().getLong(0)).toOption

  /** Read a persisted IVF index. The id/vector column names come from the
    * stored `assigned` schema (the vector is the array column); the
    * cacheKey fingerprints the store so in-process rungs never serve a
    * stale memo across a rewrite (the [[graft.operators.Bm25.readIndex]]
    * contract).
    */
  def readIvf(spark: org.apache.spark.sql.SparkSession,
              dir: String): IvfIndex = {
    val assigned = spark.read.parquet(s"$dir/assigned")
    val vecCol = assigned.schema.fields
      .find(_.dataType.typeName.startsWith("array")).map(_.name)
      .getOrElse(throw new IllegalArgumentException(
        s"no vector column in $dir/assigned: ${assigned.columns.mkString(",")}"))
    val idCol = assigned.columns
      .filterNot(c => c == "cluster_id" || c == vecCol).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"no id column in $dir/assigned: ${assigned.columns.mkString(",")}"))
    val cents = spark.read.parquet(s"$dir/centroids")
      .select("cluster_id", "centroid").orderBy("cluster_id")
      .collect().map(_.getSeq[Float](1).toArray)
    IvfIndex(assigned, cents, idCol, vecCol,
      cacheKey = Some(s"stored:$dir@${PathFingerprint(s"$dir/assigned")}"))
  }

  /** Memoized IVF index per corpus (the reference loads its FAISS index
    * once and reuses it across queries; same economics here).
    */
  private val ivfCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, IvfIndex]]()
  def cachedIvf(key: String, embeddings: => DataFrame, idCol: String, vecCol: String,
                nCentroids: Int): IvfIndex = {
    val e = embeddings // weak session keying: see Bm25.cachedIndex
    val perSession = ivfCache.synchronized {
      ivfCache.computeIfAbsent(e.sparkSession,
        _ => new java.util.concurrent.ConcurrentHashMap[String, IvfIndex]())
    }
    // nCentroids is part of the key (like cachedGraph's |k=..|p=..): a
    // re-ingested corpus whose chooseIndex outcome changes must rebuild,
    // never serve another configuration's stale centroids/assignment
    perSession.computeIfAbsent(s"$key|nc=$nCentroids", _ => {
      val ix = buildIvf(e, idCol, vecCol, nCentroids)
      ix.copy(
        assigned = ix.assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        // keyed index → the in-process serving rung can memoize its
        // cluster-grouped collect ([[ivfInMemory]])
        cacheKey = Some(s"$key|nc=$nCentroids"))
    })
  }

  /** Deterministic seeded IVF: centroids are designated corpus rows (no
    * training pass), assignment = argmax cosine tie-broken by lowest
    * centroid id. Same assignment/pruning plumbing as the KMeans-trained
    * index but fully SQL-expressible, so the whole ANN path gets a DuckDB
    * oracle (the KMeans variant's recall is spec-asserted instead).
    */
  def seededIvfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
                      centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    // struct max = lexicographic (cosine, -cid): highest cosine, ties to the
    // LOWEST centroid id — mirrors the oracle's row_number(ORDER BY cs DESC, cid)
    val best = array_max(array(centroids.map { case (cid, cv) =>
      struct(cosine(col(vecCol), vecLit(cv)).as("cs"), lit(-cid).as("ncid"))
    }: _*))
    embeddings.select(col(idCol), col(vecCol),
      (-best.getField("ncid")).as("cluster_id"))
  }

  /** Incremental index append — FAISS `add()` as a table operation: assign
    * ONLY the new batch to the EXISTING centroids (no retrain) and union
    * with the stored assignment. Assignment is per-vector independent, so
    * append-after-build ≡ bulk build over the union for ANY batch split —
    * the property sim_knn_ivf_append's oracle checks value-exactly. At
    * rest the stored assignment is a cluster_id-partitioned table and the
    * append is a partition-wise insert of batch rows; existing data is
    * never re-read. Uses the cosine assignment rule ([[seededIvfAssign]]);
    * a KMeans-built index assigns by Euclidean distance at build time, so
    * append there is nearest-by-cosine — equivalent for normalized
    * embeddings, documented divergence otherwise.
    */
  /** Incremental append to an AT-REST IVF store — FAISS `add_with_ids` +
    * `write_index` checkpoint (`embed_manager.py:502-522`) as a table
    * operation: assign ONLY the new batch to the STORED centroids (no
    * re-cluster) and append the rows into the `cluster_id`-partitioned
    * `assigned` table. Existing partition files are never read or
    * rewritten, so the append cost tracks the BATCH, not the store.
    * Assignment is the same per-vector argmax-cosine rule as [[appendIvf]]
    * — per-vector independent, so append-after-write ≡ write-over-union
    * value-exactly (oracle: sim_knn_ivf_stored_append; the KMeans
    * Euclidean-vs-cosine caveat of [[appendIvf]] applies to
    * KMeans-built stores).
    *
    * `newVectors` must carry the store's id/vector column names (they ride
    * in the stored schema — see [[readIvf]]).
    */
  def appendIvfStore(spark: org.apache.spark.sql.SparkSession, dir: String,
                     newVectors: DataFrame): Unit = {
    val ix = readIvf(spark, dir)
    // enforce id-disjointness (the Bm25.appendIndexStore contract): a
    // retried or double-run append would otherwise silently duplicate
    // rows in the assigned table and serve the same id twice
    val overlap = newVectors.select(col(ix.idCol))
      .join(ix.assigned.select(ix.idCol), Seq(ix.idCol), "left_semi")
      .count()
    require(overlap == 0L,
      s"appendIvfStore: $overlap batch ids already in the store at $dir — " +
        "anti-join the batch against the stored ids first (the ivf verb " +
        "does); rebuild the store if a previous append crashed mid-write")
    val cents = ix.centroids.zipWithIndex
      .map { case (cv, cid) => (cid, cv.toSeq) }.toSeq
    seededIvfAssign(newVectors.select(col(ix.idCol), col(ix.vecCol)),
        ix.idCol, ix.vecCol, cents)
      .withColumn("cluster_id", col("cluster_id").cast(
        ix.assigned.schema("cluster_id").dataType))
      .write.mode("append").partitionBy("cluster_id")
      .parquet(s"$dir/assigned")
  }

  def appendIvf(index: IvfIndex, newVectors: DataFrame): IvfIndex = {
    val cents = index.centroids.zipWithIndex
      .map { case (cv, cid) => (cid, cv.toSeq) }.toSeq
    index.copy(assigned = index.assigned.unionByName(
      seededIvfAssign(newVectors, index.idCol, index.vecCol, cents)
        .withColumn("cluster_id", col("cluster_id").cast(
          index.assigned.schema("cluster_id").dataType))))
  }

  /** BATCHED IVF ANN: each query probes its own `nprobe` nearest centroids
    * and scores ONLY the corpus rows of those clusters — the many-queries
    * serving regime. Probe selection is a queries×centroids broadcast cross
    * join (tiny); the corpus joins the probe set on `cluster_id`, so a
    * corpus row is scored once per query probing its cluster (corpus ×
    * nprobe/ncentroids × |Q| scored pairs instead of corpus × |Q|), then
    * the bounded [[TopKAggregator]] keeps k rows per partition per query.
    *
    * @param assigned  (idCol, vecCol, cluster_id) — from [[buildIvf]] or
    *                  [[seededIvfAssign]]
    * @param centroids (cid INT, cv ARRAY<FLOAT>) — tiny
    */
  def ivfTopKBatch(assigned: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame,
                   queries: DataFrame, qidCol: String, qvecCol: String,
                   k: Int, nprobe: Int, inMemoryLimit: Int = 200000,
                   cacheKey: Option[String] = None): DataFrame = {
    // keyed + under the guard: probe and score in process over the
    // memoized cluster-grouped broadcast — same probe ranking (raw cosine
    // desc, cid asc) and TopKAggregator order as the distributed plan
    // below (spec-proved identical); over the limit or keyless, the
    // partition-pruned distributed plan is unchanged
    if (cacheKey.isDefined && isLongArrayF32(queries, qidCol, qvecCol)) {
      // centroid collect rides the by-name `cents` parameter: forced only
      // inside ivfInMemory's memoized build, so warm calls (and over-limit
      // indexes memoized to None) pay no per-call job for it
      def collectCents: Array[(Int, Array[Float])] = {
        import assigned.sparkSession.implicits._
        centroids.select(col("cid").cast("int"), col("cv"))
          .as[(Int, Array[Float])].collect()
      }
      val inMem = for {
        bc <- ivfInMemory(assigned, idCol, vecCol, collectCents,
          inMemoryLimit, cacheKey)
        df <- searchQuerySet(queries, qidCol, qvecCol) { (qid, qv) =>
          val (cs, clusters) = bc.value
          val agg = new TopKAggregator(k)
          var b = agg.zero
          probeInMemory(cs, qv, nprobe).foreach { cid =>
            clusters.getOrElse(cid, Array.empty[(Long, Array[Float])]).foreach {
              case (id, v) =>
                b = agg.reduce(b, ScoredDoc(id, HashAlgos.cosineF32(v, qv)))
            }
          }
          b.items.iterator.zipWithIndex.map { case (sd, i) =>
            (qid, sd.doc_id, sd.score, i + 1)
          }
        }
      } yield df
      inMem match {
        case Some(df) => return df
        case None => ()
      }
    }
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col(qidCol).as("query_id"), col(qvecCol).as("qv"), col("cid"),
        cosine(col("cv"), col(qvecCol)).as("cs"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cs").desc, col("cid"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid").as("cluster_id"))
    val scored = assigned.join(broadcast(probes), "cluster_id")
      .select(col("query_id"), col(idCol).as("doc_id"),
        cosine(col(vecCol), col("qv")).as("score"))
    TopK.explodeRanked(
      scored.groupBy("query_id")
        .agg(TopK.topK(k)(col("doc_id"), col("score")).as("tk")),
      "tk", Seq("query_id"))
  }

  /** Product-quantization codebook: `cb(s)(j)` = codeword j of subspace s.
    * [[seededPqCodebook]] derives it from designated corpus rows (no
    * training pass — deterministic, so the whole PQ path carries a DuckDB
    * oracle); a Lloyd-trained codebook plugs into the same encode/score
    * path unchanged, trading oracle-exactness for quantization error.
    */
  type PqCodebook = IndexedSeq[IndexedSeq[Seq[Float]]]

  /** Codebook from the subvectors of `k` designated corpus vectors
    * (collected driver-side: m·k·subDim floats — tiny). */
  def seededPqCodebook(embeddings: DataFrame, idCol: String, vecCol: String,
                       seedIds: Seq[Long], m: Int): PqCodebook = {
    val rows = embeddings
      .filter(col(idCol).isin(seedIds: _*))
      .select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).map(_._2)
    require(rows.length == seedIds.length, "missing seed vectors")
    val subDim = rows.head.length / m
    IndexedSeq.tabulate(m)(s =>
      rows.toIndexedSeq.map(v => v.slice(s * subDim, (s + 1) * subDim)))
  }

  /** Lloyd-TRAINED PQ codebooks: per subspace, MLlib KMeans over a sample
    * of the corpus subvectors — the production-quality path (FAISS trains
    * PQ codebooks the same way). Drop-in for [[seededPqCodebook]] in the
    * same encode/score plumbing; being iteratively trained it is NOT
    * SQL-oracle-reproducible, so its quality is recall-spec-asserted
    * (VectorSearchSpec) while the seeded variant carries the value oracle.
    */
  def trainedPqCodebook(embeddings: DataFrame, idCol: String, vecCol: String,
                        m: Int, k: Int, seed: Long = 42L,
                        sampleCap: Int = 10000): PqCodebook = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = embeddings.count()
    val sample =
      (if (n > sampleCap) embeddings.sample(withReplacement = false, sampleCap.toDouble / n, seed)
       else embeddings).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = sample.select(size(col(vecCol))).head().getInt(0)
      val subDim = dim / m
      IndexedSeq.tabulate(m) { s =>
        val sub = sample.select(array_to_vector(
          slice(col(vecCol), s * subDim + 1, subDim).cast("array<double>")).as("features"))
        val model = new KMeans().setK(k).setSeed(seed + s).setMaxIter(20).fit(sub)
        model.clusterCenters.toIndexedSeq.map(c => c.toArray.map(_.toFloat).toSeq)
      }
    } finally { sample.unpersist(); () }
  }

  /** PQ encode: each vector becomes `m` small codes — `codes(s)` = index of
    * the subspace-s codeword with minimal squared L2 distance, ties to the
    * lowest code (struct-min, mirroring the oracle's
    * `row_number(ORDER BY dist, j)`). At 64-dim float32 → 8 int8-range codes
    * this is FAISS IVFPQ's 32× compression as a column transform: the
    * encoded table replaces the raw vectors for first-pass scoring, so a
    * 100 TB embedding corpus scans as ~3 TB.
    *
    * Subvector slices are BOUND to columns first — 16 inline l2Sq exprs over
    * the same slice would re-evaluate the O(subDim) slice per codeword.
    */
  /** Flat `[(s*k + j) * subDim + i]` layout for the codegen expression. */
  private def flatCb(cb: PqCodebook): Array[Float] = {
    val subDim = cb.head.head.length
    val k = cb.head.length
    val out = new Array[Float](cb.length * k * subDim)
    for (s <- cb.indices; j <- 0 until k; i <- 0 until subDim)
      out((s * k + j) * subDim + i) = cb(s)(j)(i)
    out
  }

  def pqEncode(embeddings: DataFrame, idCol: String, vecCol: String,
               cb: PqCodebook): DataFrame =
    // keeps every input column (cluster_id etc. — IVFPQ composes by
    // encoding the IVF-assigned table) and appends `codes`; the encode is
    // ONE codegen call per row (codebook rides as a reference object), not
    // an m·k-leaf literal expression tree
    embeddings.withColumn("codes",
      graft.functions.FastFunctions.pqEncode(col(vecCol), flatCb(cb),
        cb.length, cb.head.length, cb.head.head.length))

  /** The struct-min / l2Sq column-function twin of [[pqEncode]] —
    * spec-asserted identical to the codegen expression (and the shape the
    * DuckDB oracle mirrors).
    */
  def pqEncodeSpec(embeddings: DataFrame, idCol: String, vecCol: String,
                   cb: PqCodebook): DataFrame = {
    val m = cb.length
    val subDim = cb.head.head.length
    val orig = embeddings.columns.toSeq
    val withSubs = embeddings.select(
      (orig.map(col) ++
        (0 until m).map(s => slice(col(vecCol), s * subDim + 1, subDim).as(s"_sub$s"))): _*)
    val codes = array((0 until m).map { s =>
      val best = array_min(array(cb(s).indices.map(j =>
        struct(l2Sq(col(s"_sub$s"), vecLit(cb(s)(j))).as("d"),
          lit(j).as("j"))): _*))
      best.getField("j")
    }: _*)
    withSubs.select((orig.map(col) :+ codes.as("codes")): _*)
  }

  /** ADC lookup table for one query: `lut(s*k + j)` = squared L2 distance
    * from the query's subspace-s slice to codeword j — computed with the
    * EXACT operation order of [[graft.functions.VectorFunctions.l2Sq]]
    * (float→double subtraction, square, sequential accumulation from 0.0),
    * so driver, codegen and oracle values are bit-identical
    * (spec-asserted in VectorSearchSpec).
    */
  def pqLut(cb: PqCodebook, query: Seq[Float]): Array[Double] = {
    val m = cb.length
    val subDim = cb.head.head.length
    val out = new Array[Double](m * cb.head.length)
    var s = 0
    while (s < m) {
      val q = query.slice(s * subDim, (s + 1) * subDim)
      var j = 0
      while (j < cb(s).length) {
        val c = cb(s)(j)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = q(i).toDouble - c(i).toDouble
          acc = acc + d * d
          i += 1
        }
        out(s * cb(s).length + j) = acc
        j += 1
      }
      s += 1
    }
    out
  }

  /** Per-query recall@k of the IVF probe path against the exact scan over
    * the same corpus — the standard ANN quality metric (FAISS reports the
    * same number for its IVF indexes; the reference trains IVF at
    * `embed_manager.py:694-715` and searches with nprobe at
    * `query/search.py:222-231`). Both sides run as one DAG: the approximate
    * top-k via [[ivfTopKBatch]] (probe → prune → score), the exact top-k via
    * the bounded [[bruteTopKBatchAgg]], then an inner join counts the
    * intersection per query. Emitting recall AS DATA makes the
    * KMeans-trained ANN path value-checkable downstream even though the
    * training itself is iterative (not SQL-reproducible): the recall bound
    * is a closed-form oracle row.
    */
  def ivfRecallAtK(index: IvfIndex, queries: DataFrame, qidCol: String,
                   qvecCol: String, k: Int, nprobe: Int): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val centDf = index.centroids.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("cid", "cv")
    val approx = ivfTopKBatch(index.assigned, index.idCol, index.vecCol,
        centDf, queries, qidCol, qvecCol, k, nprobe)
      .select(col("query_id"), col("doc_id"))
    val exact = bruteTopKBatchAgg(index.assigned, index.idCol, index.vecCol,
        queries, qidCol, qvecCol, k)
      .select(col("query_id"), col("doc_id"))
    val hits = approx.join(exact, Seq("query_id", "doc_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    queries.select(col(qidCol).as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("hits"), lit(0L)) / k.toDouble).as(s"recall_at_$k"))
  }

  /** Recall@k at several nprobe settings as one table
    * `(query_id, nprobe, recall)`. Two invariants hold BY CONSTRUCTION for
    * any training outcome, which is what makes the KMeans ANN path
    * oracle-checkable (sim_knn_ivf):
    *
    *  - '''monotone''': the probe sets are nested (top-2 ⊆ top-4 ⊆ … by the
    *    same centroid ranking), and a global-top-k item present in a scanned
    *    subset always survives that subset's top-k (fewer than k items
    *    outscore it globally, so fewer than k in the subset). Hence recall
    *    is non-decreasing in nprobe.
    *  - '''exact at full probe''': nprobe = ncentroids scans every cluster,
    *    so recall = 1.0 exactly — verifying the assignment neither drops
    *    nor duplicates corpus rows and the pruned scoring matches the exact
    *    scan.
    */
  def ivfRecallProfile(index: IvfIndex, queries: DataFrame, qidCol: String,
                       qvecCol: String, k: Int, nprobes: Seq[Int]): DataFrame =
    nprobes.map { np =>
      ivfRecallAtK(index, queries, qidCol, qvecCol, k, np)
        .withColumnRenamed(s"recall_at_$k", "recall")
        .withColumn("nprobe", lit(np))
    }.reduce(_ unionByName _)

  /** Asymmetric-distance top-k over PQ codes: distance ≈ Σ_s lut[s][code_s]
    * — m array lookups per row instead of a D-dim float scan, the FAISS ADC
    * scoring loop as a codegen'd column expression over a broadcast literal
    * LUT. Exact re-rank of the shortlist (if wanted) composes with
    * [[bruteTopK]] over the id-filtered raw vectors.
    */
  def pqAdcTopK(encoded: DataFrame, idCol: String, codesCol: String,
                cb: PqCodebook, query: Seq[Float], k: Int): DataFrame = {
    val lut = pqLut(cb, query)
    val dist = graft.functions.FastFunctions.pqAdcDist(col(codesCol), lut, cb.head.length)
    encoded
      .select(col(idCol).as("doc_id"), round(dist, 6).as("dist"))
      .orderBy(col("dist").asc, col("doc_id"))
      .limit(k)
  }

  /** PQ search with exact re-rank: ADC scores the WHOLE corpus from codes
    * (cheap — m table lookups/row), keeps a `shortlist`-sized candidate set,
    * then re-scores only those candidates with exact L2 over the raw
    * vectors — FAISS's two-stage IVFPQ+refine recipe. At 100 TB the raw
    * vector fetch is a semi-join against `shortlist` ids (bucket-pruned at
    * rest), not a second corpus scan.
    */
  def pqTopKWithRerank(encoded: DataFrame, idCol: String, vecCol: String,
                       codesCol: String, cb: PqCodebook, query: Seq[Float],
                       k: Int, shortlist: Int): DataFrame = {
    val cand = pqAdcTopK(encoded, idCol, codesCol, cb, query, shortlist)
      .select(col("doc_id"))
    encoded.join(cand, encoded(idCol) === cand("doc_id"), "left_semi")
      .select(col(idCol).as("doc_id"),
        round(l2Sq(col(vecCol), vecLit(query)), 6).as("dist"))
      .orderBy(col("dist").asc, col("doc_id"))
      .limit(k)
  }

  /** Batched IVFPQ search: probe → ADC shortlist → exact cosine re-rank
    * for a DRIVER-HELD query set in one DAG — each query row carries its
    * own probe list and ADC LUT into a single broadcast join
    * ([[PqAdcDistColsExpr]] reads the LUT as column data), instead of the
    * jobs-per-query driver loop the per-query composition pays. Ranking
    * contract identical to `probeIdsExact → pqAdcTopK(shortlist) →
    * bruteTopK`: shortlist by (round-6 ADC dist asc, doc_id asc), final
    * scores exact cosine (desc, doc_id asc) — spec-proved row-for-row.
    *
    * 100 TB: the probed-cluster join is the same partition-pruned scan the
    * single-query path uses; the shortlist aggregate is map-side bounded;
    * the re-rank joins a broadcast |queries|·shortlist id set.
    */
  def ivfPqTopKBatch(encoded: DataFrame, idCol: String, vecCol: String,
                     codesCol: String, cb: PqCodebook,
                     centroids: Array[Array[Float]],
                     queries: Seq[(Long, Seq[Float])], k: Int, nprobe: Int,
                     shortlist: Int): DataFrame = {
    val short = ivfPqAdcShortlist(encoded, idCol, codesCol, cb, centroids,
      queries, nprobe, shortlist)
      .select(col("query_id"), col("doc_id"))
    val spark = encoded.sparkSession
    import spark.implicits._
    val qonly = queries.toDF("query_id", "qv")
    val rescored = encoded.select(col(idCol).as("doc_id"), col(vecCol).as("_v"))
      .join(broadcast(short), Seq("doc_id"))
      .join(broadcast(qonly), Seq("query_id"))
      .select(col("query_id"), col("doc_id"), cosine(col("_v"), col("qv")).as("score"))
    TopK.explodeRanked(
      rescored.groupBy("query_id")
        .agg(TopK.topK(k)(col("doc_id"), col("score")).as("tk")),
      "tk", Seq("query_id"))
  }

  /** The ADC stage of [[ivfPqTopKBatch]]: per query, the `shortlist` best
    * codes rows in ADC order — (query_id, doc_id, score = negated round-6
    * ADC distance, rank). The per-query constants are broadcast ONCE each:
    * the probe pair list carries only (query_id, cluster_id) and the m·k
    * double LUT rides a second one-row-per-query broadcast joined after the
    * cluster fan-out, instead of duplicating qv+LUT nprobe-fold.
    */
  private def ivfPqAdcShortlist(encoded: DataFrame, idCol: String,
                                codesCol: String, cb: PqCodebook,
                                centroids: Array[Array[Float]],
                                queries: Seq[(Long, Seq[Float])],
                                nprobe: Int, shortlist: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val probes = queries.flatMap { case (qid, qv) =>
      probeIdsExact(spark, centroids, qv, nprobe).map(cid => (qid, cid))
    }.toDF("query_id", "cluster_id")
    val qluts = queries.map { case (qid, qv) => (qid, pqLut(cb, qv).toSeq) }
      .toDF("query_id", "lut")
    // negated round-6 ADC distance: the (score desc, doc_id asc) aggregator
    // order then equals pqAdcTopK's (dist asc, doc_id asc)
    val cand = encoded.join(broadcast(probes), Seq("cluster_id"))
      .join(broadcast(qluts), Seq("query_id"))
      .select(col("query_id"), col(idCol).as("doc_id"),
        negate(round(graft.functions.FastFunctions.pqAdcDistCols(
          col(codesCol), col("lut")), 6)).as("nd"))
    TopK.explodeRanked(
      cand.groupBy("query_id")
        .agg(TopK.topK(shortlist)(col("doc_id"), col("nd")).as("tk")),
      "tk", Seq("query_id"))
  }

  /** Tuner evaluation artifact: the ADC shortlist of [[ivfPqTopKBatch]]
    * with each candidate's EXACT cosine score attached — (query_id, doc_id,
    * rank = ADC rank, score). One job yields the recall of every shortlist
    * prefix: rows 1..sl re-ranked by (score desc, doc_id asc) are exactly
    * what `ivfPqTopKBatch(…, sl)` returns, so [[tuneServing]] walks the
    * shortlist ladder without re-searching.
    */
  private[graft] def ivfPqAdcScored(encoded: DataFrame, idCol: String,
                                    vecCol: String, codesCol: String,
                                    cb: PqCodebook,
                                    centroids: Array[Array[Float]],
                                    queries: Seq[(Long, Seq[Float])],
                                    nprobe: Int, shortlist: Int): DataFrame = {
    val short = ivfPqAdcShortlist(encoded, idCol, codesCol, cb, centroids,
      queries, nprobe, shortlist)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val spark = encoded.sparkSession
    import spark.implicits._
    val qonly = queries.toDF("query_id", "qv")
    encoded.select(col(idCol).as("doc_id"), col(vecCol).as("_v"))
      .join(broadcast(short), Seq("doc_id"))
      .join(broadcast(qonly), Seq("query_id"))
      .select(col("query_id"), col("doc_id"), col("rank"),
        cosine(col("_v"), col("qv")).as("score"))
  }

  /** IVF query: prune to the nprobe nearest clusters, exact cosine inside.
    * Centroid ranking is driver-side math over ncentroids vectors (tiny —
    * this mirrors FAISS's coarse quantizer step, nprobe default 32 at
    * `/root/reference/config/models.py:189`).
    */
  def ivfTopK(index: IvfIndex, query: Seq[Float], k: Int, nprobe: Int): DataFrame =
    bruteTopK(probeScan(index, query, nprobe), index.idCol, index.vecCol, query, k)

  /** The nprobe nearest cluster ids for a query — driver-side math over
    * ncentroids vectors (tiny; FAISS's coarse quantizer step).
    */
  def probeClusters(index: IvfIndex, query: Seq[Float], nprobe: Int): Seq[Int] = {
    val qa = query.toArray
    def cos(c: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < c.length) { d += c(i) * qa(i); na += c(i) * c(i); nb += qa(i) * qa(i); i += 1 }
      if (na > 0 && nb > 0) d / math.sqrt(na * nb) else 0.0
    }
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, cos(c)) }
      .sortBy { case (i, s) => (-s, i) }
      .take(nprobe).map(_._1).toSeq
  }

  /** Top-`nprobe` centroid ids ranked through the SAME cosine Expression
    * the cluster scan uses — driver-side float math ([[probeClusters]])
    * can diverge from the codegen expression in the last bit, and a probe
    * flip would change which clusters get scanned. The seeded oracle
    * queries (sim_knn_ivf_seeded / sim_knn_ivfpq) rank probes this way for
    * exactness; serving paths that carry a value oracle must too. One tiny
    * local job over ncentroids rows.
    */
  def probeIdsExact(spark: org.apache.spark.sql.SparkSession,
                    centroids: Array[Array[Float]], query: Seq[Float],
                    nprobe: Int): Seq[Int] = {
    import spark.implicits._
    centroids.toIndexedSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cid", "cv")
      .select(col("cid"), cosine(col("cv"), vecLit(query)).as("cs"))
      .orderBy(col("cs").desc, col("cid")).limit(nprobe)
      .select("cid").collect().map(_.getInt(0)).toIndexedSeq
  }

  /** The corpus restricted to a query's probed clusters — partition-pruned
    * at rest when `assigned` is stored partitioned by `cluster_id`. Callers
    * score it with whatever ranking they need ([[ivfTopK]] uses
    * [[bruteTopK]]; KbPipeline applies its rounded-rank scoring so the IVF
    * path keeps the pipeline's determinism contract).
    */
  def probeScan(index: IvfIndex, query: Seq[Float], nprobe: Int): DataFrame =
    index.assigned.filter(
      col("cluster_id").isin(probeClusters(index, query, nprobe): _*))

  // ── Graph ANN: the HNSW rung of the reference's index ladder
  //    (`/root/reference/embedding/index.py:84-92`, m=32), re-expressed as
  //    the batch analogue that fits Spark's execution model. HNSW itself is
  //    a pointer-chasing serving structure (sequential hops per query over
  //    a mutable multi-layer graph) — the wrong shape for a distributed
  //    batch engine. What DOES map: (a) its layer-0 neighborhood graph,
  //    built as a DataFrame ([[knnGraph]] — LSH-bucketed candidates, never
  //    all-pairs), and (b) its greedy best-first search, unrolled to a
  //    FIXED number of hops over a whole query batch at once
  //    ([[graphSearch]] — each hop is one join against the graph, the
  //    per-query beam is the candidate pool). Both are deterministic
  //    (hash-derived planes, seeded entry points, doc-id tie-breaks), so
  //    the whole path carries a value-exact DuckDB oracle — same bar as
  //    the IVF/PQ rungs. ─────────────────────────────────────────────────

  /** Memoized [[knnGraph]] per corpus (an index: built once, persisted,
    * reused across queries — same economics as [[cachedIvf]]).
    */
  private val graphCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()
  def cachedGraph(key: String, embeddings: => DataFrame, idCol: String,
                  vecCol: String, k: Int, numPlanes: Int = 4): DataFrame = {
    val e = embeddings // weak session keying: see Bm25.cachedIndex
    val perSession = graphCache.synchronized {
      graphCache.computeIfAbsent(e.sparkSession,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    }
    // localCheckpoint (not just persist): the graph's build plan embeds
    // large plane-literal expression trees, and search plans reference the
    // graph several times per hop — truncating lineage to a LogicalRDD
    // leaf keeps per-query analysis O(search plan), not O(build plan).
    // Cluster deployments would write the graph to storage instead
    // (reliable checkpoint), same economics as any index.
    perSession.computeIfAbsent(s"$key|k=$k|p=$numPlanes", _ =>
      knnGraph(e, idCol, vecCol, k, numPlanes = numPlanes).localCheckpoint(true))
  }

  /** Sign-LSH bucket of a vector over `numPlanes` hash-derived ±1
    * hyperplanes ([[Dedup.rademacherPlane]] family — the oracle recomputes
    * the identical buckets): bit p of the bucket is [dot(v, plane_p) ≥ 0].
    */
  def signBucket(vec: Column, dim: Int, numPlanes: Int, seed: Long): Column = {
    val planes = Array.tabulate(numPlanes, dim)((p, j) => Dedup.rademacherPlane(p, j, seed))
    (0 until numPlanes).map { p =>
      when(dot(vec, vecLit(planes(p).toSeq)) >= 0, shiftleft(lit(1L), p))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Geometry-independent block id for long-range graph links: an integer
    * hash of the node id into ~n/blockSize blocks. Same formula in the
    * DuckDB oracle. Contract: ids non-negative and < ~2^31 so the product
    * stays in BIGINT range cross-engine (Spark wraps on Long overflow,
    * DuckDB errors) — true of every id column this engine produces.
    */
  def longBlock(id: Column, nBlocks: Int, seed: Long): Column =
    pmod((id * lit(2654435761L) + lit(seed) * lit(131L)) % lit(1000000007L),
      lit(nBlocks.toLong))

  /** Plane count for [[knnGraph]] sized to the corpus: enough sign-LSH
    * planes that expected bucket size ≈ `targetBucket`, so the per-bucket
    * self-joins stay bounded as n grows (numPlanes = ⌈log2(n/targetBucket)⌉
    * — the same corpus-sized-policy spirit as [[chooseIndex]]).
    */
  def graphPlanesFor(n: Long, targetBucket: Int = 64): Int =
    math.min(20, math.max(1,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt))

  /** Deterministic k-NN graph with small-world links (the HNSW layer-0
    * batch analogue). Two edge types, both from keyed self-joins (never
    * all-pairs), both exact-cosine-ranked per source:
    *
    *  - '''local''' (`kind='l'`, rnk ≤ k): candidates from `reps`
    *    independent sign-LSH bucketings — same-bucket nodes in at least
    *    one repetition. These capture the neighborhood structure but are
    *    geometry-derived, so on their own the graph fragments into one
    *    component per bucket-overlap region.
    *  - '''long''' (`kind='g'`, rnk ≤ kLong): candidates from a
    *    geometry-INDEPENDENT hash of the node id into ~n/blockSize blocks
    *    ([[longBlock]]) — the Kleinberg/NSW long-range links that make the
    *    graph connected and navigable. HNSW gets these from its random
    *    insertion order; a hash block is the deterministic batch analogue.
    *
    * Returns `(src, dst, cos, kind, rnk)`; a pair can carry both kinds.
    *
    * 100 TB shape: each candidate generator is a self-join keyed on its
    * bucket/block (bounded sizes: 2^numPlanes spread, resp. blockSize);
    * the pair distinct and per-(src,kind) windows shuffle only edge ids;
    * vectors re-join by id AFTER dedup so arrays never ride through the
    * distinct. One `count()` at build time sizes the block table — index
    * builds are allowed a job.
    */
  def knnGraph(embeddings: DataFrame, idCol: String, vecCol: String,
               k: Int, numPlanes: Int = 4, reps: Int = 2,
               kLong: Int = 4, blockSize: Int = 32,
               bucketWindow: Int = 16, seed: Long = 42L): DataFrame =
    graphEdges(embeddings, idCol, vecCol, k, numPlanes, reps, kLong,
      blockSize, bucketWindow, seed, onlySrc = None)

  /** Incremental graph append — the HNSW-insert batch analogue: compute
    * local+long edges FOR the new nodes with the same buckets, sorted-
    * neighborhood windows and hash blocks a bulk [[knnGraph]] over the
    * union uses, and leave every existing node's edge list untouched.
    * Searches read edges undirected ([[graphSearch]]'s symmetrized
    * expansion), so the new→old edges make appended nodes reachable
    * without rewriting old lists — HNSW's own insert contract (the new
    * element links out; reverse traversal comes from the undirected
    * reading). Deliberately NOT equal to a bulk rebuild, which would also
    * re-rank OLD lists against the arrivals; the trade is that only
    * O(|batch|·window·reps + |batch|·blockSize) candidate pairs are scored
    * per append (the bucket-rank windows still scan the corpus id/bucket
    * columns — at rest that bucket table is a stored index derivative,
    * like the IVF assignment, so a real deployment windows only the
    * affected buckets).
    *
    * @param embeddings the UNION corpus (existing ∪ new) — bucket ranks and
    *                   block sizing must see all nodes
    * @param newIds     one-column DataFrame of the appended node ids
    */
  def appendGraph(graph: DataFrame, embeddings: DataFrame, idCol: String,
                  vecCol: String, newIds: DataFrame, k: Int,
                  numPlanes: Int = 4, reps: Int = 2, kLong: Int = 4,
                  blockSize: Int = 32, bucketWindow: Int = 16,
                  seed: Long = 42L): DataFrame =
    graph.unionByName(graphEdges(embeddings, idCol, vecCol, k, numPlanes,
      reps, kLong, blockSize, bucketWindow, seed,
      onlySrc = Some(newIds.select(col(newIds.columns.head).as("src")))))

  private def graphEdges(embeddings: DataFrame, idCol: String, vecCol: String,
                         k: Int, numPlanes: Int, reps: Int,
                         kLong: Int, blockSize: Int,
                         bucketWindow: Int, seed: Long,
                         onlySrc: Option[DataFrame]): DataFrame = {
    val head = embeddings.select(size(col(vecCol))).take(1)
    if (head.isEmpty)
      return embeddings.select(col(idCol).as("src"), col(idCol).as("dst"),
        lit(0.0).as("cos"), lit("l").as("kind"), lit(0).as("rnk"))
        .filter(lit(false))
    val dim = head(0).getInt(0)
    val n = embeddings.count()
    val nBlocks = math.max(1L, n / blockSize).toInt
    val withBuckets = embeddings.select(
      col(idCol).as("_id") +:
        (0 until reps).map(r =>
          signBucket(col(vecCol), dim, numPlanes, seed + r).as(s"_b$r")) :+
        longBlock(col(idCol), nBlocks, seed).as("_bg"): _*)
    // Sorted-neighborhood pairing within a bucket: rank members by id and
    // pair each node with the `bucketWindow` ranks above it (then
    // symmetrize). All-pairs within a bucket is quadratic in bucket size,
    // and bucket sizes are NOT bounded by plane count when the corpus has
    // duplicate-heavy regions (exact copies share every geometric bucket —
    // measured: a 50×-replicated corpus made the all-pairs build ~100×
    // slower). The window caps candidate volume at n·bucketWindow·reps for
    // ANY duplication level — the same bounded-blocking idea as
    // charNgramJaccard's df cap, but degrading gracefully instead of
    // dropping the block. The explode keeps the join equi-keyed.
    def pairsOn(bucketCol: String): DataFrame = {
      val ranked = withBuckets.select(col("_id"), col(bucketCol).as("_bk"))
        .withColumn("_rn", row_number().over(
          Window.partitionBy("_bk").orderBy("_id")))
      val up = ranked.select(col("_id").as("src"), col("_bk"),
          explode(sequence(col("_rn") + 1, col("_rn") + bucketWindow)).as("_rn"))
        .join(ranked.select(col("_id").as("dst"), col("_bk"), col("_rn")),
          Seq("_bk", "_rn"))
        .select("src", "dst")
      up.unionByName(up.select(col("dst").as("src"), col("src").as("dst")))
    }
    val localCand = (0 until reps).map(r => pairsOn(s"_b$r"))
      .reduce(_ unionByName _).distinct()
    // long blocks are sized (~blockSize members), so all-pairs stays
    // bounded there by construction
    val longCand = {
      val a = withBuckets.select(col("_id").as("src"), col("_bg"))
      val b = withBuckets.select(col("_id").as("dst"), col("_bg"))
      a.join(b, Seq("_bg")).filter(col("src") =!= col("dst"))
        .select("src", "dst")
    }
    val va = embeddings.select(col(idCol).as("src"), col(vecCol).as("_va"))
    val vb = embeddings.select(col(idCol).as("dst"), col(vecCol).as("_vb"))
    // append path: keep only candidate pairs whose SOURCE is an appended
    // node — the filter sits BEFORE the vector joins and cosine scoring,
    // so the expensive work is batch-bounded (None = bulk build, no-op)
    def restrict(cand: DataFrame): DataFrame =
      onlySrc.fold(cand)(ids => cand.join(broadcast(ids), Seq("src"), "left_semi"))
    def ranked(cand: DataFrame, kind: String, kk: Int): DataFrame =
      cand.join(va, "src").join(vb, "dst")
        .select(col("src"), col("dst"), cosine(col("_va"), col("_vb")).as("cos"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))))
        .filter(col("rnk") <= kk)
        .select(col("src"), col("dst"), col("cos"), lit(kind).as("kind"), col("rnk"))
    ranked(restrict(localCand), "l", k)
      .unionByName(ranked(restrict(longCand), "g", kLong))
  }

  /** NN-Descent refinement (Dong et al., WWW'11 — the standard distributed
    * kNN-graph improvement): each round proposes every node's
    * neighbors-of-neighbors as new local-edge candidates — "a neighbor of
    * my neighbor is likely my neighbor" — rescores with exact cosine, and
    * keeps the best `k` per node. Local edges (`kind='l'`) improve
    * monotonically (the old edges stay in the candidate set — a structural
    * invariant the spec asserts per node); long links (`kind='g'`) pass
    * through untouched, preserving navigability. Deterministic: same
    * cosine ranking and doc-id tie-breaks as [[knnGraph]].
    *
    * When to use it — measured, not assumed: refinement is for when the
    * kNN GRAPH ITSELF is the deliverable (neighbor lists for dedup,
    * recommendations, clustering features) — there, closer neighbors are
    * strictly better and the per-node improvement invariant is the goal.
    * For SEARCH navigability it can hurt: tightening every node's edges
    * to its k closest prunes the medium-range links beam search climbs
    * through (measured on a 20-cluster corpus: recall@10 0.67 → 0.47 at
    * beam=16-24, recovering to 1.0 only at beam=48; flat 0.97 on uniform
    * random) — the same effect HNSW counters with its diversity-selection
    * heuristic. Serve searches from the UNREFINED small-world graph; the
    * spec asserts the edge-quality invariant and search non-regression at
    * the generous-beam operating point.
    *
    * 100 TB shape: each round is two id-keyed self-joins over the edge
    * list (≤ n·k² candidate rows before the distinct, k² per node —
    * bounded by construction, no corpus-sized state), one vector re-join,
    * one per-src window. Lineage is truncated per round (iterative
    * DataFrame loop, same as connectedComponents).
    */
  def refineGraph(graph: DataFrame, embeddings: DataFrame, idCol: String,
                  vecCol: String, k: Int, rounds: Int = 1): DataFrame = {
    val longEdges = graph.filter(col("kind") === "g")
    val va = embeddings.select(col(idCol).as("src"), col(vecCol).as("_va"))
    val vb = embeddings.select(col(idCol).as("dst"), col(vecCol).as("_vb"))
    var local = graph.filter(col("kind") === "l")
      .select("src", "dst").localCheckpoint(true)
    (1 to rounds).foreach { _ =>
      val und = local.unionByName(
        local.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val twoHop = und.select(col("src"), col("dst").as("_mid"))
        .join(und.select(col("src").as("_mid"), col("dst")), "_mid")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      val cand = und.unionByName(twoHop).distinct()
      local = cand.join(va, "src").join(vb, "dst")
        .select(col("src"), col("dst"), cosine(col("_va"), col("_vb")).as("cos"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))))
        .filter(col("rnk") <= k)
        .select("src", "dst").localCheckpoint(true)
    }
    local.join(va, "src").join(vb, "dst")
      .select(col("src"), col("dst"), cosine(col("_va"), col("_vb")).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))))
      .select(col("src"), col("dst"), col("cos"), lit("l").as("kind"), col("rnk"))
      .unionByName(longEdges)
  }

  /** Symmetrized distinct edge list of a graph, memoized per graph
    * DataFrame INSTANCE (weak keys — [[cachedGraph]] hands out one instance
    * per corpus, so repeated searches reuse the materialized table; a fresh
    * spec graph just pays its own one-time derivation).
    */
  private val edgeCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, DataFrame]())
  private def undirectedEdges(graph: DataFrame): DataFrame =
    edgeCache.computeIfAbsent(graph, g =>
      g.select(col("src").as("doc_id"), col("dst"))
        .unionByName(g.select(col("dst").as("doc_id"), col("src").as("dst")))
        .distinct().localCheckpoint(true))

  /** Batched greedy beam search over a [[knnGraph]] — HNSW's search loop
    * unrolled to `hops` iterations of: expand the per-query pool by its
    * members' graph neighbors, rescore, keep the best `beam`. The pool is
    * monotone non-worsening; fixed `entryIds` seed every query's pool.
    * Returns `(query_id, doc_id, score, rank)`, top `k` per query
    * (`beam ≥ k`), score rounded 6dp for a stable output contract.
    *
    * Scale shape: the frontier is ≤ beam rows per query (broadcast side);
    * each hop is one join keyed on the graph's `src` plus one id-keyed
    * score join — corpus-sized state never accumulates per query.
    *
    * Serving shape: when the indexed corpus fits under `inMemoryLimit`
    * rows (LIMIT-bounded count, the [[graft.operators.Dedup]] broadcast-
    * guard pattern), vectors + adjacency are broadcast ONCE and the whole
    * beam search runs inside a single mapPartitions over the queries —
    * the reference's in-process HNSW serving regime, one stage instead of
    * ~2 exchanges per hop. The in-memory loop replays the distributed
    * semantics operation-for-operation (same [[HashAlgos.cosineF32]]
    * arithmetic order, same (score desc, id asc) beam selection, same
    * HALF_UP 6dp rounding), so results are identical on either path
    * (spec-proved); `inMemoryLimit = 0` forces the distributed plan.
    * Above the limit — the 100 TB regime — nothing changes: hop joins
    * against the partitioned edge table. `cacheKey` memoizes the
    * broadcast per session so build-once serve-many callers skip the
    * re-collect.
    */
  def graphSearch(graph: DataFrame, embeddings: DataFrame, idCol: String,
                  vecCol: String, queries: DataFrame, qidCol: String,
                  qvecCol: String, k: Int, beam: Int, hops: Int,
                  entryIds: Seq[Long], inMemoryLimit: Int = 200000,
                  cacheKey: Option[String] = None): DataFrame = {
    require(beam >= k, s"beam ($beam) must be >= k ($k)")
    graphSearchInMemory(graph, embeddings, idCol, vecCol, queries, qidCol,
      qvecCol, k, beam, hops, entryIds, inMemoryLimit, cacheKey)
      .getOrElse(graphSearchDistributed(graph, embeddings, idCol, vecCol,
        queries, qidCol, qvecCol, k, beam, hops, entryIds))
  }

  /** The broadcast one-stage serving path; None when the corpus exceeds
    * the limit or the id/vector column types don't fit the fast path.
    */
  private type InMemGraph =
    org.apache.spark.broadcast.Broadcast[(Map[Long, Array[Float]], Map[Long, Array[Long]])]
  private val inMemGraphCache = new SessionMemo[Option[InMemGraph]]
  private def graphSearchInMemory(graph: DataFrame, embeddings: DataFrame,
                                  idCol: String, vecCol: String,
                                  queries: DataFrame, qidCol: String,
                                  qvecCol: String, k: Int, beam: Int,
                                  hops: Int, entryIds: Seq[Long],
                                  inMemoryLimit: Int,
                                  cacheKey: Option[String]): Option[DataFrame] = {
    if (inMemoryLimit <= 0) return None
    if (!isLongArrayF32(embeddings, idCol, vecCol) ||
        !isLongArrayF32(queries, qidCol, qvecCol)) return None
    val spark = embeddings.sparkSession
    import spark.implicits._
    // unlike the flat tier, a KEYLESS graph search still builds in memory:
    // the distributed alternative is ~2 exchanges × hops of scheduling,
    // so even a per-call build wins (−69% measured); the byte budget and
    // null filter guard the collect the same way as corpusInMemory
    def build(): Option[InMemGraph] = {
      val emb = embeddings.select(col(idCol), col(vecCol))
        .filter(col(vecCol).isNotNull)
      val n = emb.limit(inMemoryLimit + 1).count()
      val dim = emb.select(size(col(vecCol))).take(1)
        .headOption.map(_.getInt(0).toLong).getOrElse(0L)
      if (n > inMemoryLimit || n * math.max(dim, 1L) > InMemMaxFloats) None
      else {
        val vectors = emb.as[(Long, Array[Float])].collect().toMap
        val adj = undirectedEdges(graph)
          .select(col("doc_id").cast("long"), col("dst").cast("long"))
          .as[(Long, Long)].collect()
          .groupBy(_._1).map { case (s, ds) => s -> ds.map(_._2) }
        Some(spark.sparkContext.broadcast((vectors, adj)))
      }
    }
    val built = cacheKey match {
      case Some(k0) =>
        inMemGraphCache.getOrBuild(spark, s"$k0|lim=$inMemoryLimit")(build())
      case None => build()
    }
    built.map { bc =>
      val entrySeq = entryIds.distinct
      val (kk, bb, hh) = (k, beam, hops)
      queries.select(col(qidCol), col(qvecCol)).as[(Long, Array[Float])]
        .mapPartitions { rows =>
          val (vecs, edges) = bc.value
          // the distributed path's exact order — primitive-comparison
          // semantics like TopKAggregator.better (score desc, id asc;
          // -0.0 == 0.0 ties break by id, unlike java.lang.Double.compare)
          val ord = new Ordering[(Long, Double)] {
            def compare(a: (Long, Double), b: (Long, Double)): Int =
              if (a._2 > b._2) -1
              else if (b._2 > a._2) 1
              else java.lang.Long.compare(a._1, b._1)
          }
          rows.flatMap { case (qid, qv) =>
            var frontier = entrySeq.flatMap(id => vecs.get(id).map(v =>
              id -> HashAlgos.cosineF32(v, qv))).sorted(ord).take(bb)
            var hop = 0
            while (hop < hh) {
              val seen = new java.util.HashSet[Long]()
              val cand = Seq.newBuilder[(Long, Double)]
              frontier.foreach { case (id, s) =>
                if (seen.add(id)) cand += (id -> s) // score already known
              }
              frontier.foreach { case (id, _) =>
                edges.getOrElse(id, Array.emptyLongArray).foreach { nb =>
                  if (seen.add(nb))
                    vecs.get(nb).foreach(v => cand += (nb -> HashAlgos.cosineF32(v, qv)))
                }
              }
              frontier = cand.result().sorted(ord).take(bb)
              hop += 1
            }
            frontier.take(kk).zipWithIndex.map { case ((id, s), i) =>
              (qid, id, graft.functions.HashAlgos.roundHalfUp(s, 6), i + 1)
            }
          }
        }
        .toDF("query_id", "doc_id", "score", "rank")
    }
  }

  private def graphSearchDistributed(graph: DataFrame, embeddings: DataFrame,
                                     idCol: String, vecCol: String,
                                     queries: DataFrame, qidCol: String,
                                     qvecCol: String, k: Int, beam: Int,
                                     hops: Int, entryIds: Seq[Long]): DataFrame = {
    val spark = embeddings.sparkSession
    val q = queries.select(col(qidCol).as("query_id"), col(qvecCol).as("_qv"))
    val emb = embeddings.select(col(idCol).as("doc_id"), col(vecCol).as("_dv"))
    def scored(cand: DataFrame): DataFrame =
      cand.join(emb, "doc_id").join(broadcast(q), "query_id")
        .select(col("query_id"), col("doc_id"),
          cosine(col("_dv"), col("_qv")).as("score"))
    // Each hop is ONE bounded aggregation: [[TopK.topKDistinct]] fuses the
    // candidate `.distinct()` and the row_number window (a shuffle plus a
    // per-group sort) into a map-side-combined partial top-beam — per hop,
    // at most `beam` rows per query per partition reach the exchange
    // instead of the full edge fanout, and the sort disappears. Output is
    // identical to the window formulation: the buffer order is the same
    // (score desc, doc_id asc) key, and a candidate reached via several
    // edges carries one score, so dedup-in-buffer equals pre-distinct.
    def topBeam(cand: DataFrame, n: Int): DataFrame =
      TopK.explodeRanked(
        scored(cand).groupBy("query_id")
          .agg(TopK.topKDistinct(n)(col("doc_id"), col("score")).as("_tk")),
        "_tk", Seq("query_id"))
    import spark.implicits._
    val entries = entryIds.toDF("doc_id")
    var frontier = topBeam(q.select(col("query_id")).crossJoin(entries), beam)
    // expansion follows links in BOTH directions — the undirected reading
    // HNSW gives its neighbor lists (insertion adds reverse links); without
    // it, nodes that rank nobody's top-k are unreachable. The symmetrized
    // distinct edge list is derived ONCE per graph instance and checkpointed
    // ([[undirectedEdges]]): every hop of every search over a cached graph
    // joins a materialized edge table instead of re-running the
    // union+distinct shuffle — an index derivative, same economics as the
    // graph itself
    val edges = undirectedEdges(graph)
    (1 to hops).foreach { _ =>
      val cand = frontier.select("query_id", "doc_id")
        .unionByName(frontier.select("query_id", "doc_id")
          .join(edges, "doc_id")
          .select(col("query_id"), col("dst").as("doc_id")))
      frontier = topBeam(cand, beam)
    }
    // the last hop's explode order IS the final ordering (score desc,
    // doc_id asc), so top-k is a filter on its rank — no extra pass
    frontier.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }

  /** Graph search over the DISTINCT-vector sub-corpus, copies expanded
    * back afterward — the duplicate-saturation fix the round-10 recall
    * sweep motivated (tools/recall_r10.txt): on a 50×-replicated corpus
    * plain [[graphSearch]] recall@10 collapses to ~0.08 because identical
    * copies saturate every bucket's sorted-neighborhood window, while the
    * graph over UNIQUES keeps its small-world structure (and is duplication
    * times smaller to build). HNSW deployments do the same thing one layer
    * up (dedup before indexing); here it is part of the operator.
    *
    * Semantics: representatives are min-id per exact vector value; the
    * top-k representative hits expand to ALL their copies and the final
    * top-k re-ranks by (rounded score, id) — identical copies carry
    * identical scores, so this equals exact search's ordering contract on
    * the expanded corpus. Correct for k because every representative
    * expands to ≥1 row.
    *
    * 100 TB shape: the group-by-vector and the copy-expansion join shuffle
    * on the vector value / rep id (the exact-dedup shapes); the graph is
    * built and searched over the (smaller) unique corpus.
    *
    * `cacheKey` opts into build-once serve-many economics: reps, the
    * copy-expansion mapping, the reps graph, and the entry points are
    * memoized per (session, key) — same pattern as [[cachedGraph]] /
    * [[cachedServing]]. Without it every call re-derives the index
    * (correct, but the build dominates serving).
    */
  private val dedupServeCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame, Seq[Long])]]()
  /** How many smallest rep ids the dedup build pre-collects: entry sets up
    * to this size (the tuner's whole ladder) come from the cached prefix
    * with no extra job.
    */
  private val DedupEntryPrefix = 64

  /** The entry ids [[graphSearchDeduped]] will use for `nEntries` — exposed
    * so the tuner can keep its calibration queries honest (a query that IS
    * an entry starts the search at its own answer and fakes the recall).
    */
  def dedupEntryIds(embeddings: DataFrame, idCol: String, vecCol: String,
                    nEntries: Int, cacheKey: Option[String]): Seq[Long] =
    dedupBase(embeddings, idCol, vecCol, cacheKey)._3.take(nEntries)

  /** (reps, copy-expansion mapping, smallest-rep-id prefix) — built once
    * per cache key; the ENTRY COUNT is not part of the key, so walking
    * entry ladders never rebuilds or re-pins the corpus-scale state.
    */
  private def dedupBase(embeddings: DataFrame, idCol: String, vecCol: String,
                        cacheKey: Option[String]): (DataFrame, DataFrame, Seq[Long]) = {
    def build(): (DataFrame, DataFrame, Seq[Long]) = {
      val reps0 = embeddings.groupBy(col(vecCol))
        .agg(min(col(idCol)).as(idCol))
        .select(col(idCol), col(vecCol))
      val mapping0 = embeddings.select(col(idCol).as("_dup"), col(vecCol))
        .join(reps0.select(col(idCol).as("_rep"), col(vecCol)), vecCol)
        .select("_rep", "_dup")
      // checkpoint when memoized: reps is re-joined every hop and mapping
      // once per query — lineage truncation is what makes reuse cheap
      val (r, m) = if (cacheKey.isDefined)
        (reps0.localCheckpoint(true), mapping0.localCheckpoint(true))
      else (reps0, mapping0)
      val prefix = r.select(col(idCol).cast("long")).orderBy(col(idCol))
        .limit(DedupEntryPrefix).collect().map(_.getLong(0)).toSeq
      (r, m, prefix)
    }
    cacheKey match {
      case Some(k0) =>
        val perSession = dedupServeCache.synchronized {
          dedupServeCache.computeIfAbsent(embeddings.sparkSession,
            _ => new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame, Seq[Long])]())
        }
        perSession.computeIfAbsent(s"$k0|base", _ => build())
      case None => build()
    }
  }

  def graphSearchDeduped(embeddings: DataFrame, idCol: String, vecCol: String,
                         queries: DataFrame, qidCol: String, qvecCol: String,
                         k: Int, kGraph: Int = 8, numPlanes: Int = 4,
                         beam: Int = 48, hops: Int = 3,
                         nEntries: Int = 4,
                         cacheKey: Option[String] = None): DataFrame = {
    val (reps, mapping, prefix) = dedupBase(embeddings, idCol, vecCol, cacheKey)
    val entries =
      if (nEntries <= prefix.size) prefix.take(nEntries)
      else reps.select(col(idCol).cast("long")).orderBy(col(idCol))
        .limit(nEntries).collect().map(_.getLong(0)).toSeq
    val g = cacheKey match {
      case Some(k0) => cachedGraph(s"$k0|dedup", reps, idCol, vecCol,
        k = kGraph, numPlanes = numPlanes)
      case None => knnGraph(reps, idCol, vecCol, k = kGraph, numPlanes = numPlanes)
    }
    val repHits = graphSearch(g, reps, idCol, vecCol, queries, qidCol, qvecCol,
      k, beam = math.max(beam, k), hops = hops, entryIds = entries,
      cacheKey = cacheKey.map(k0 => s"$k0|dedup-mem"))
    // copy expansion can fan k rep hits out to k × duplication rows; the
    // bounded aggregator keeps only k per query per partition ahead of the
    // exchange (same order key as the row_number window it replaces)
    TopK.explodeRanked(
      repHits.select(col("query_id"), col("doc_id").as("_rep"), col("score"))
        .join(mapping, "_rep")
        .select(col("query_id"), col("_dup").as("doc_id"), col("score"))
        .groupBy("query_id")
        .agg(TopK.topK(k)(col("doc_id"), col("score")).as("_tk")),
      "_tk", Seq("query_id"))
  }
}
