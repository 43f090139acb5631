package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the QUICK brown fox, jumps over the lazy dog near the river bank today"), // exact dup after cleaning
    (3L, "The quick brown fox jumps over the lazy cat near the river bank today"),  // near dup (1 token)
    (4L, "Completely different content talking about distributed query engines"),
    (5L, "Another unrelated text on parquet columnar storage formats and codecs"))
    .toDF("doc_id", "text")

  test("exactGroups maps cleaned-identical docs to one keeper") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(1L) == 1L)
    assert(groups(2L) == 1L) // case/punct-insensitive duplicate of 1
    assert(groups(3L) == 3L)
    assert(groups(4L) == 4L)
  }

  test("exact keeps exactly one row per duplicate group") {
    val kept = Dedup.exact(docs, "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("LSH candidates contain the near-duplicate pair and jaccard confirms it") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", shingleN = 3, numHashes = 16)
    val buckets = Dedup.lshBuckets(sigs, bands = 8, rowsPerBand = 2)
    val cands = Dedup.lshCandidates(buckets)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)), "exact dup pair must collide in every band")
    assert(cands.contains((1L, 3L)) || cands.contains((2L, 3L)),
      s"near-dup should collide in some band, got $cands")
    val verified = Dedup.jaccardPairs(docs, "doc_id", "text",
        Dedup.lshCandidates(buckets), shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(verified((1L, 2L)) == 1.0, "cleaned-identical docs have Jaccard 1")
    verified.get((1L, 3L)).foreach(j => assert(j > 0.5 && j < 1.0))
  }

  test("lshCandidatesAcross: only cross-corpus pairs, lake side as doc_a") {
    // lake = docs 1-3 (1 and 2 are dups of each other), batch = a dup of 1
    // plus an unrelated doc
    val batch = Seq(
      (10L, "The quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "Nothing like anything else in the lake whatsoever columnar or not"))
      .toDF("doc_id", "text")
    def buckets(d: org.apache.spark.sql.DataFrame) =
      Dedup.lshBuckets(Dedup.minhashSignatures(d, "doc_id", "text"), 4, 4)
    val cand = Dedup.lshCandidatesAcross(buckets(docs), buckets(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 10L)), "the planted cross-corpus dup must surface")
    assert(cand.forall { case (a, b) => a <= 5L && b >= 10L },
      "candidates must pair lake docs with batch docs only — " +
        "within-corpus pairs never materialize")
    assert(!cand.exists(_._2 == 11L), "unrelated batch doc shares no band")
  }

  test("lshCandidatesAcross: oversized batch takes the shuffled fallback with identical output") {
    val batch = Seq(
      (10L, "The quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "Nothing like anything else in the lake whatsoever columnar or not"))
      .toDF("doc_id", "text")
    def buckets(d: org.apache.spark.sql.DataFrame) =
      Dedup.lshBuckets(Dedup.minhashSignatures(d, "doc_id", "text"), 4, 4)
    val viaBroadcast = Dedup.lshCandidatesAcross(buckets(docs), buckets(batch))
    // broadcastRowLimit = 0 forces every batch over the threshold → the
    // shuffled-join path; results must be identical to the broadcast path
    val viaShuffle = Dedup.lshCandidatesAcross(buckets(docs), buckets(batch),
      broadcastRowLimit = 0L)
    val collect = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collect(viaShuffle) == collect(viaBroadcast))
    assert(collect(viaShuffle).contains((1L, 10L)))
    // the guard controls the EXPLICIT broadcast hint (AQE may still choose
    // broadcast for a genuinely tiny side — that is fine); assert the hint
    // itself is present on the normal path and absent on the fallback
    assert(viaBroadcast.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(!viaShuffle.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "oversized batch must not carry a broadcast hint")
  }

  test("lshCandidatesAcross: extreme broadcastRowLimit values neither throw nor change output") {
    val batch = Seq(
      (10L, "The quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    def buckets(d: org.apache.spark.sql.DataFrame) =
      Dedup.lshBuckets(Dedup.minhashSignatures(d, "doc_id", "text"), 4, 4)
    val collect = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = collect(Dedup.lshCandidatesAcross(buckets(docs), buckets(batch)))
    // Long.MaxValue must not overflow into limit(negative); a negative
    // limit must clamp to the always-shuffle path, not throw
    val viaMax = Dedup.lshCandidatesAcross(buckets(docs), buckets(batch),
      broadcastRowLimit = Long.MaxValue)
    val viaNeg = Dedup.lshCandidatesAcross(buckets(docs), buckets(batch),
      broadcastRowLimit = -1L)
    assert(collect(viaMax) == base && collect(viaNeg) == base)
    assert(!viaNeg.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "negative limit must take the shuffled path")
    // knownBatchRows skips the guard count but must not change output;
    // an over-limit claim routes to the shuffled path, an in-limit claim
    // keeps the broadcast hint
    val viaKnown = Dedup.lshCandidatesAcross(buckets(docs), buckets(batch),
      knownBatchRows = Some(4L))
    val viaKnownBig = Dedup.lshCandidatesAcross(buckets(docs), buckets(batch),
      knownBatchRows = Some(Long.MaxValue))
    assert(collect(viaKnown) == base && collect(viaKnownBig) == base)
    assert(viaKnown.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(!viaKnownBig.queryExecution.analyzed.toString.contains("ResolvedHint"))
  }

  test("simhashPairs finds near-dups within the Hamming budget, not unrelated docs") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L || p._2 == 5L && p._1 != 4L))
  }

  test("connectedComponents: chains close transitively, components stay separate") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11,
    // triangle 20-21-22, nodes only in pairs appear
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    // driver union-find path (default) and distributed loop path
    // (driverEdgeLimit = 0) must agree exactly
    val viaDriver = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val viaLoop = Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == want)
    assert(viaLoop == want)
  }

  test("connectedComponents: empty input and long-chain convergence") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
    // a 30-node path exercises many propagation rounds in the DISTRIBUTED loop
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 30 && got.values.forall(_ == 1L))
  }

  test("connectedComponents: string ids take the generic path and match Long results") {
    // the primitive LongUnionFind path is Long-only; string ids must flow
    // through the generic union-find (and the seed-contract regime when
    // forced over the limit) with identical component structure
    val pairs = Seq(("b", "a"), ("b", "c"), ("x", "y"), ("m", "m"))
      .toDF("doc_a", "doc_b")
    val want = Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "m" -> "m")
    val viaDriver = Dedup.connectedComponents(pairs)
      .as[(String, String)].collect().toMap
    assert(viaDriver == want)
    // forced over the (zero) limit: one useless seed pass + stars — the
    // generic seed plumbing and the composition joins must hold for strings
    val viaLoop = Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
      .as[(String, String)].collect().toMap
    assert(viaLoop == want)
    // seed-contract regime with a tiny head (limit 2 < 5 edges ≤ 4×2):
    // iterated driver passes + composition across pass maps
    val viaSeed = Dedup.connectedComponents(pairs, driverEdgeLimit = 2L)
      .as[(String, String)].collect().toMap
    assert(viaSeed == want)
  }

  test("connectedComponents: Long ids in the seed-contract regime (limit between 1x and 4x)") {
    // 12 edges with limit 5: ⌈12/5⌉ ≤ 4 passes of iterated contraction,
    // finishing on the driver — must equal the plain driver answer
    val pairs = ((1L until 9L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (30L, 31L), (40L, 30L)))
      .toDF("doc_a", "doc_b")
    val direct = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val seeded = Dedup.connectedComponents(pairs, driverEdgeLimit = 5L)
      .as[(Long, Long)].collect().toMap
    assert(seeded == direct)
    assert((1L to 9L).forall(seeded(_) == 1L))
    assert(seeded(22L) == 20L && seeded(40L) == 30L)
  }

  test("localContractPass: connectivity-equivalent star edges + raw overflow") {
    // one partition's edges: chain 1-2-3-4 and pair (10, 11) — the pass
    // must emit (node -> local min) for every non-root node and nothing else
    val got = Dedup.localContractPass(
      Iterator((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))).toSet
    assert(got == Set((2L, 1L), (3L, 1L), (4L, 1L), (11L, 10L)), s"got $got")
    // self-loop-only nodes vanish (callers re-attach them from the full
    // node list); empty input stays empty
    assert(Dedup.localContractPass(Iterator((7L, 7L))).isEmpty)
    assert(Dedup.localContractPass(Iterator.empty).isEmpty)
  }

  test("bothStarsPass: one sorted pass emits both star families, no group-close") {
    // symmetrized sorted chain 1-2-3 partition: groups 1:{2}, 2:{1,3}, 3:{2}
    //  group 1: large-star (2, 1); group 2: small-star member 1 == min ->
    //  nothing, large-star (3, min(2,1)=1); group 3: single smaller member
    //  == min -> nothing (the classical group-close (3,2) is DROPPED — the
    //  connectivity of 3 comes from group 2's large-star emission)
    val got = Dedup.bothStarsPass(Iterator(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))).toSeq
    assert(got == Seq((2L, 1L), (3L, 1L)), s"got $got")
    // a fixpoint star reproduces itself EXACTLY (duplicate-free): center 1
    // re-emits each member via large-star; member groups emit nothing
    val star = Dedup.bothStarsPass(Iterator(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))).toSeq
    assert(star == Seq((2L, 1L), (3L, 1L), (4L, 1L)), s"got $star")
    // within-group duplicates are skipped on the fly; self-loops ignored
    val dup = Dedup.bothStarsPass(Iterator(
      (1L, 2L), (1L, 2L), (2L, 1L), (2L, 1L), (2L, 2L))).toSeq
    assert(dup == Seq((2L, 1L)), s"got $dup")
    assert(Dedup.bothStarsPass(Iterator.empty).isEmpty)
  }

  test("connectedComponents: scattered partitioning (no locality) still exact") {
    // round-robin repartition makes adjacent chain edges never co-locate,
    // so the local contraction contracts ~nothing and the star loop does
    // the whole job — results must match the driver answer exactly
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      .repartition(8)
    val got = Dedup.connectedComponents(chain, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 60 && got.values.forall(_ == 1L))
  }

  test("connectedComponentsStars agrees with driver union-find on random graphs") {
    // the alternating large-star/small-star loop is the >driverEdgeLimit
    // scale path — it must be VALUE-identical to exact union-find on any
    // graph shape: random sparse (many components), plus a deep chain
    // grafted in (the high-diameter shape min-label propagation choked on)
    val rnd = new scala.util.Random(7)
    val rand = (0 until 600).map(_ =>
      (rnd.nextInt(500).toLong, rnd.nextInt(500).toLong)).filter(p => p._1 != p._2)
    val chain = (1000L until 1150L).map(i => (i, i + 1))
    val pairs = (rand ++ chain).toDF("doc_a", "doc_b")
    val viaDriver = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val starRows = Dedup.connectedComponents(pairs, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toSeq
    // exactly ONE row per node: a duplicated star edge surviving to the
    // fixpoint would multiply rows through the final node join (the
    // fused bothStarsPass drops the small-star group-close precisely so
    // fixpoint stars reproduce duplicate-free)
    assert(starRows.size == starRows.map(_._1).distinct.size,
      s"${starRows.size} rows for ${starRows.map(_._1).distinct.size} nodes")
    val viaStars = starRows.toMap
    assert(viaStars == viaDriver)
    // every chain node landed in the chain-min component
    assert((1000L to 1150L).forall(viaStars(_) == 1000L))
  }

  test("connectedComponentsStars: permuted chains force the stall finisher and stay exact") {
    // id-permuted scattered chains defeat every locality tier, so the
    // star loop hits the r17 STALL path (pointer-double + contract) —
    // often more than once, exercising the relabel COMPOSITION at
    // assembly. Output must be value-identical to driver union-find and
    // one-row-per-node, exactly like the plain path.
    // a TRUE (Fisher-Yates) permutation: the Scale receipt's modular
    // bijection keeps enough arithmetic structure at unit scale for the
    // range tier to contract through it
    val n = 64000
    val ids = (0L until n).toArray
    val prnd = new scala.util.Random(12345)
    var i = n - 1
    while (i >= 1) {
      val j = prnd.nextInt(i + 1)
      val t = ids(i); ids(i) = ids(j); ids(j) = t
      i -= 1
    }
    val chains = (0 until 2).flatMap { c =>
      (0 until 31999).map(k => (ids(c * 32000 + k), ids(c * 32000 + k + 1)))
    }
    val pairs = chains.toDF("doc_a", "doc_b").repartition(32)
    val viaDriver = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val log = new java.io.ByteArrayOutputStream()
    // the test session's 4 shuffle partitions make the ID-locality
    // range windows a QUARTER of the id ring — wide enough to contract
    // even permuted ids. 64 windows restores the production geometry
    // (window ≪ component id-span) so the no-locality stall is reachable
    // at unit-test scale.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val starRows = Console.withOut(new java.io.PrintStream(log)) {
      try {
        // AQE coalesces this tiny fixture's range exchange to ONE
        // partition, where the local union-find solves the whole graph —
        // production-scale graphs keep many windows; pin that geometry
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        Dedup.connectedComponentsStars(pairs).as[(Long, Long)].collect().toSeq
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    }
    assert(log.toString.contains("stall -> pointer-double + contract"),
      s"the fixture must exercise the stall finisher; loop log:\n$log")
    assert(starRows.size == starRows.map(_._1).distinct.size,
      s"${starRows.size} rows for ${starRows.map(_._1).distinct.size} nodes")
    assert(starRows.toMap == viaDriver)
    assert(starRows.map(_._2).distinct.size == 2, "two chain components")
  }

  test("embeddingDups finds planted high-cosine pairs inside LSH buckets") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val nearDup = base.map(x => x + 0.001f)
    val others = (3L to 20L).map(i => i -> Array.fill(16)(rnd.nextFloat() - 0.5f))
    val emb = (Seq(1L -> base, 2L -> nearDup) ++ others).toDF("vec_id", "embedding")
    val dups = Dedup.embeddingDups(emb, "vec_id", "embedding",
        threshold = 0.99, numPlanes = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(dups == Set((1L, 2L)), s"got $dups")
  }

  test("buildBloom: no false negatives, and misses stay mostly negative") {
    import graft.functions.HashAlgos
    val keys = (1L to 500L).map(_ * 7919L)
    val fps = keys.toDF("fp")
    val (words, k) = Dedup.buildBloom(fps, "fp", expectedItems = 500L, fpp = 0.01)
    assert(keys.forall(HashAlgos.bloomMightContain(words, k, _)),
      "a bloom filter must never reject an inserted key")
    val misses = (1L to 2000L).map(_ * 7919L + 3L)
      .count(HashAlgos.bloomMightContain(words, k, _))
    assert(misses <= 60, s"~1% fpp expected, got $misses/2000 false positives")
  }

  test("incrementalBloom matches the plain exact join, at any bloom size") {
    val lake = docs // docs 1-5; 1 and 2 are cleaned-identical
    val batch = Seq(
      (10L, "THE QUICK brown fox jumps over the lazy dog near the river bank today"), // dup of 1/2
      (11L, "Entirely novel content that the lake has never seen before at all"))
      .toDF("doc_id", "text")
    val expect = Map(10L -> Some(1L), 11L -> None) // keeper = LOWEST lake id
    val collect = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(collect(Dedup.incrementalBloom(lake, batch, "doc_id", "text")) == expect)
    // a deliberately saturated 64-bit bloom produces false positives on
    // most lake rows — the exact verify join must still yield identical
    // output (no false negatives exist by construction)
    assert(collect(Dedup.incrementalBloom(lake, batch, "doc_id", "text",
      maxBits = 64L)) == expect)
    // knownBatchRows skips the sizing count without changing the result
    assert(collect(Dedup.incrementalBloom(lake, batch, "doc_id", "text",
      knownBatchRows = Some(2L))) == expect)
  }

  test("incrementalBloom: empty batch and empty lake degenerate cleanly") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.incrementalBloom(docs, empty, "doc_id", "text").count() == 0)
    val vsEmptyLake = Dedup.incrementalBloom(empty, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(vsEmptyLake.keySet == Set(1L, 2L, 3L, 4L, 5L) &&
      vsEmptyLake.values.forall(identity),
      "against an empty lake every batch doc is new")
  }

  test("semanticDups: in-cluster drops with lowest keeper; cross-cluster near-dups pruned by design") {
    val cents = Seq(0 -> Seq(1f, 0f), 1 -> Seq(0f, 1f))
    val emb = Seq(
      1L -> Array(1f, 0.01f),   // cluster 0
      2L -> Array(1f, 0.02f),   // cluster 0, ~identical to 1 → dup, keeper 1
      3L -> Array(0.01f, 1f),   // cluster 1
      4L -> Array(0.02f, 1f),   // cluster 1, ~identical to 3 → dup, keeper 3
      5L -> Array(1f, 0.99f),   // cluster 0 ┐ cosine(5,6) ≈ 0.99997 but they
      6L -> Array(0.99f, 1f),   // cluster 1 ┘ straddle the boundary → NOT a pair
      7L -> Array(1f, 0.015f))  // cluster 0, near BOTH 1 and 2 → keeper must be 1
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDups(emb, "vec_id", "embedding", cents, threshold = 0.9)
      .select("dup_id", "keep_id").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 4L -> 3L, 7L -> 1L), s"got $got")
  }

  test("fuzzyPairs: within-block pairs under the distance bound, cross-block never") {
    val df = Seq(
      (1L, "cold widget"), (2L, "bold widget"), (3L, "small widget"),
      (4L, "cold rod"), (5L, "gold rod"))
      .toDF("id", "name")
    val bk = element_at(split(col("name"), " "), -1)
    val pairs = Dedup.fuzzyPairs(df, "id", "name", maxDist = 2, bk)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // (1,2) dist 1; (4,5) dist 1; (1,3)/(2,3) dist > 2; widget↔rod blocked apart
    assert(pairs == Set((1L, 2L, 1), (4L, 5L, 1)), s"got $pairs")
  }

  test("duplicatedSpans: maximal regions via island merge, self-repeats, short docs, adjacency") {
    val spanDocs = Seq(
      // docs 1/2 share the 5-token region w1..w5 at different offsets →
      // two overlapping duplicated 4-grams merge into one maximal span each
      (1L, "w1 w2 w3 w4 w5 x1 x2 x3"),
      (2L, "z1 z2 w1 w2 w3 w4 w5 z3"),
      (3L, "u1 u2 u3"),                          // unique short doc → no rows
      // self-repetition inside one doc: two disjoint islands
      (4L, "r1 r2 r3 r4 k1 k2 r1 r2 r3 r4"),
      (5L, "s1 s2"), (6L, "s1 s2"),              // dup shorter than n → partial-shingle span
      // adjacency: doc 7's halves are each duplicated elsewhere but the
      // straddling middle 4-grams are not — adjacent islands must merge
      (7L, "a1 a2 a3 a4 b1 b2 b3 b4"),
      (8L, "a1 a2 a3 a4 c1 c2 c3 c4"),
      (9L, "d1 d2 d3 d4 b1 b2 b3 b4"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", n = 4)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(got == Set(
      (1L, 0, 5, 5), (2L, 2, 7, 5),
      (4L, 0, 4, 4), (4L, 6, 10, 4),
      (5L, 0, 2, 2), (6L, 0, 2, 2),
      (7L, 0, 8, 8), (8L, 0, 4, 4), (9L, 4, 8, 4)), s"got $got")

    // ── removal: canonical (lowest doc, start) occurrence survives, the
    //    rest are stripped; docs whose islands MERGED differently carry a
    //    different span content, so each keeps its own canonical (the
    //    documented composition caveat) ──────────────────────────────────
    val cleaned = Dedup.removeDuplicatedSpans(spanDocs,
        Dedup.duplicatedSpans(spanDocs, "doc_id", "text", n = 4),
        "doc_id", "text")
      .select("doc_id", "clean_text", "n_removed_tokens")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cleaned == Map(
      1L -> (("w1 w2 w3 w4 w5 x1 x2 x3", 0L)),  // canonical of w1..w5
      2L -> (("z1 z2 z3", 5L)),                 // non-canonical copy stripped
      3L -> (("u1 u2 u3", 0L)),                 // untouched unique doc
      4L -> (("r1 r2 r3 r4 k1 k2", 4L)),        // self-repeat: first island kept
      5L -> (("s1 s2", 0L)),                    // canonical short dup
      6L -> (("", 2L)),                         // fully-duplicated doc empties
      7L -> (("a1 a2 a3 a4 b1 b2 b3 b4", 0L)),  // merged 8-token island ≠ the
      8L -> (("a1 a2 a3 a4 c1 c2 c3 c4", 0L)),  //   4-token islands: all three
      9L -> (("d1 d2 d3 d4 b1 b2 b3 b4", 0L))), //   are their own canonicals
      s"got $cleaned")
  }

  test("minhashPairsDeduped == raw sigs->LSH->verify pipeline on a dup-saturated corpus") {
    // three text classes: A, a near-dup of A, and unrelated B — each
    // replicated with distinct ids, plus null/empty docs
    val tA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val tA2 = (1 to 30).map(i => s"alpha$i").mkString(" ") + " extratoken"
    val tB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val docs = (
      (0 until 6).map(i => (100L + i, tA)) ++
      (0 until 5).map(i => (200L + i, tA2)) ++
      (0 until 4).map(i => (300L + i, tB)) ++
      Seq((400L, null.asInstanceOf[String]), (401L, ""))).toDF("doc_id", "text")
    val raw = {
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      val cand = Dedup.lshCandidates(Dedup.lshBuckets(sigs, bands = 4, rowsPerBand = 4))
      Dedup.jaccardPairs(docs, "doc_id", "text", cand)
        .filter(col("jaccard") >= 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val fast = Dedup.minhashPairsDeduped(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast == raw, s"deduped ${fast.size} pairs != raw ${raw.size}:\n" +
      s"missing=${raw -- fast}\nextra=${fast -- raw}")
    // sanity: the dup groups actually produced quadratic output
    assert(raw.size >= 6 * 5 / 2 + 5 * 4 / 2 + 4 * 3 / 2)
    assert(raw.exists(_._3 < 1.0), "cross-class near-dups present")
  }

  test("minhashPairsAuto picks the regime and both arms match the raw composition") {
    val tA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val tB = (1 to 30).map(i => s"beta$i").mkString(" ")
    // saturated: 10 copies of each of 2 texts -> distinct ratio 0.1
    val saturated = ((0 until 10).map(i => (100L + i, tA)) ++
      (0 until 10).map(i => (200L + i, tB))).toDF("doc_id", "text")
    // clean: 20 distinct texts -> ratio 1.0
    val clean = (0 until 20)
      .map(i => (300L + i, (1 to 30).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    def raw(d: org.apache.spark.sql.DataFrame) = {
      val sigs = Dedup.minhashSignatures(d, "doc_id", "text")
      Dedup.jaccardPairs(d, "doc_id", "text",
          Dedup.lshCandidates(Dedup.lshBuckets(sigs, 4, 4)))
        .filter(col("jaccard") >= 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    def auto(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashPairsAuto(d, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto(saturated) == raw(saturated))
    assert(auto(saturated).size == 2 * 10 * 9 / 2, "every twin pair present")
    assert(auto(clean) == raw(clean))
  }
}
