package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnhancementRerankSpec extends SparkSpec {
  import spark.implicits._

  private def enhance1(s: String): String =
    Seq(s).toDF("q").select(Enhancement.enhance(col("q"))).as[String].first()

  test("normalization collapses whitespace and punctuation runs") {
    assert(enhance1("what   is   happening??") == "what is happening")
    assert(enhance1("wow!!! now,,, please") == "wow now please")
  }

  test("repeated-letter heuristic: goooood -> good survives tokenization") {
    assert(enhance1("goooood results") == "good results")
    assert(enhance1("soooo sloooow") == "soo sloow") // collapse to 2, not 1
  }

  test("synonym expansion emits (word OR syn...) only for dictionary words >= 4 chars") {
    assert(enhance1("fast join") == "(fast OR quick OR rapid) (join OR merge OR combine)")
    assert(enhance1("the cat ran") == "the cat ran") // <4 chars / stopwords untouched
  }

  test("enriched synonym map: breadth on fixture vocabulary, pinned entries and e2e texts untouched") {
    import graft.queries.EngineQueries
    // breadth: the round-10 enrichment takes the map well past the original
    // seven fixture entries
    assert(Enhancement.Synonyms.size >= 80, s"got ${Enhancement.Synonyms.size}")
    // the original seven are PINNED — e2e oracle SQL embeds their expansions
    assert(Enhancement.Synonyms("query") == Seq("search", "lookup"))
    assert(Enhancement.Synonyms("fast") == Seq("quick", "rapid"))
    assert(Enhancement.Synonyms("join") == Seq("merge", "combine"))
    assert(Enhancement.Synonyms("filter") == Seq("predicate", "where"))
    assert(Enhancement.Synonyms("window") == Seq("frame", "range"))
    assert(Enhancement.Synonyms("error") == Seq("fault", "failure"))
    assert(Enhancement.Synonyms("document") == Seq("text", "record"))
    // no NEW key may appear as a token of any pinned e2e query text — that
    // would silently change the pinned enhanced literals the oracles embed
    val pinnedTokens = (EngineQueries.E2eBatch20.map(_._1) ++
      Seq(EngineQueries.E2eQueryText, EngineQueries.E2eQueryText2))
      .flatMap(_.split("\\s+")).toSet
    val original = Set("query", "fast", "join", "filter", "window", "error", "document")
    val collisions = Enhancement.Synonyms.keySet.diff(original).intersect(pinnedTokens)
    assert(collisions.isEmpty, s"new synonym keys collide with pinned e2e texts: $collisions")
    // expansion breadth on a fixture vocabulary
    assert(enhance1("delete the broken index") ==
      "(delete OR remove OR erase) the (broken OR damaged OR faulty) (index OR catalog OR register)")
    assert(enhance1("verify schema update") ==
      "(verify OR confirm OR validate) (schema OR structure OR layout) (update OR modify OR revise)")
  }

  test("enhanceValue (driver-side constant fold) == column enhance on every shape") {
    val cases = Seq("what   is   happening??", "stop!!! now,,, please",
      "goooood results", "soooo sloooow", "fast join", "the cat ran",
      "fast spark join and filter queries", "", "a", "‘smart’ “quotes”  !!")
    cases.foreach { s =>
      assert(Enhancement.enhanceValue(spark, s) == enhance1(s), s"input: '$s'")
    }
  }

  test("spelling correction: typo corrected, known/short/no-candidate untouched") {
    // vocab: "spark" in 3 docs, "sparse" in 1 — the df tie-break must pick
    // "spark" for the distance-1 typo "spak" (both are distance 1)
    val docs = Seq(
      (1L, "spark filter window"), (2L, "spark join"), (3L, "spark merge"),
      (4L, "sparse matrix"))
      .toDF("doc_id", "text")
    val vocab = Spelling.vocabulary(docs, "text")
    val got = Spelling.correctQueries(
        Seq((1, "spak filter ab zzzqqq")).toDF("qid", "q"), "qid", "q", vocab)
      .select("corrected").as[String].first()
    //  spak -> spark (df 3 beats sparse df 1); filter known -> untouched;
    //  ab short -> skipped; zzzqqq no candidate -> untouched
    assert(got == "spark filter ab zzzqqq")
  }

  test("spelling correction: deletion and insertion typos both correct") {
    val docs = Seq((1L, "window filter")).toDF("doc_id", "text")
    val vocab = Spelling.vocabulary(docs, "text")
    val got = Spelling.correctQueries(
        Seq((1, "windoww ilter")).toDF("qid", "q"), "qid", "q", vocab)
      .select("corrected").as[String].first()
    assert(got == "window filter") // extra char dropped, missing char restored
  }

  test("enhanceBatch composes spelling correction with synonym expansion") {
    val docs = Seq((1L, "fast spark window")).toDF("doc_id", "text")
    val vocab = Spelling.vocabulary(docs, "text")
    val got = Enhancement.enhanceBatch(
        Seq((1, "fsat   spark windw??")).toDF("qid", "q"), "qid", "q", vocab)
      .select("enhanced").as[String].first()
    // fsat -> fast (distance-1 "substitution pair" via shared deletes is
    // NOT possible here: levenshtein(fsat, fast)=2 transposition — so fsat
    // stays; windw -> window corrects, then expands via the synonym table
    assert(got == "fsat spark (window OR frame OR range)")
  }

  test("enhanced clean preserves entity spans like URLs (F2 NER preservation)") {
    import graft.functions.TextFunctions
    val got = Seq("Dr. Alice Johnson from Acme Corp visited New York via " +
        "https://acme.example.com quickly!").toDF("txt")
      .select(TextFunctions.enhancedCleanText(col("txt"))).as[String].first()
    // cleaned body first, then preserved refs: URL, then entity spans
    // (sorted, lowercased — the reference restores entities lowercased,
    // text_utils.py:178-180)
    assert(got.contains("https://acme.example.com"), got)
    assert(got.endsWith("acme corp dr. alice johnson new york"), got)
    // no-entity text: behavior unchanged (no trailing junk, no separator)
    val plain = Seq("The quick BROWN fox!").toDF("txt")
      .select(TextFunctions.enhancedCleanText(col("txt"))).as[String].first()
    assert(plain == "quick brown fox!", plain)
  }

  test("spelling correction keeps empty-tokenizing queries as empty strings") {
    val docs = Seq((1L, "spark filter window")).toDF("doc_id", "text")
    val vocab = Spelling.vocabulary(docs, "text")
    val out = Spelling.correctQueries(
        Seq((1, "?!,, ... !!"), (2, "spark")).toDF("qid", "q"), "qid", "q", vocab)
      .orderBy("qid").select("corrected").as[String].collect()
    assert(out.toSeq == Seq("", "spark"), out.toSeq.toString)
  }

  test("rerankHeadBatch == per-query rerankHead") {
    val rnd = new scala.util.Random(3)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val hits = (for (q <- Seq(1L, 2L); d <- 1L to 12L) yield
      (q, d * 10 + q, rnd.nextInt(100).toDouble,
        Seq.fill(3)(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("query_id", "doc_id", "score", "text")
    val queries = Map(1L -> "alpha beta", 2L -> "gamma zeta")
    val qdf = queries.toSeq.toDF("query_id", "qtext")
    val batch = Rerank.rerankHeadBatch(
        hits.join(qdf, "query_id"), "query_id", "score", 5,
        Rerank.lexicalScoreCols(
          array_distinct(graft.functions.TextFunctions.tokenizeBm25(col("qtext"))),
          col("text")))
      .select("query_id", "doc_id", "final_rank")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    queries.foreach { case (q, qtext) =>
      val single = Rerank.rerankHead(hits.filter(col("query_id") === q), "score", 5,
          Rerank.lexicalScore(qtext, col("text")))
        .select("doc_id", "final_rank").as[(Long, Int)].collect().toMap
      single.foreach { case (d, rk) =>
        assert(batch((q, d)) == rk, s"query $q doc $d")
      }
    }
  }

  test("rerankHeadBatch plans NO global window: every window partitions by query id") {
    val hits = (for (q <- Seq(1L, 2L); d <- 1L to 5L) yield
      (q, d, d.toDouble, "alpha beta")).toDF("query_id", "doc_id", "score", "text")
    val out = Rerank.rerankHeadBatch(hits, "query_id", "score", 3,
      Rerank.lexicalScore("alpha", col("text")))
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty &&
        w.partitionSpec.exists(_.references.exists(_.name == "query_id")),
        s"global window in batch rerank plan: $w")
    }
    // the single-query form is the one with global windows — its contract
    // (scaladoc) is bounded input; the multi-query path must use the batch
    // twin, which KbPipeline.queryBatch does (KbPipelineSpec parity test)
  }

  test("rerankHead reorders only the head, tail keeps original order") {
    val hits = Seq(
      (1L, 10.0, "zz yy xx"),          // rank 1, no query overlap
      (2L, 9.0, "alpha beta gamma"),   // rank 2, full overlap
      (3L, 8.0, "alpha beta zz"),      // rank 3, partial overlap
      (4L, 7.0, "unrelated words"),    // rank 4 -> tail, stays 4th
      (5L, 6.0, "alpha beta gamma")    // rank 5 -> tail, stays 5th
    ).toDF("doc_id", "score", "text")
    val out = Rerank.rerankHead(hits, "score", topK = 3,
        Rerank.lexicalScore("alpha beta gamma", col("text")))
      .select("doc_id", "final_rank").as[(Long, Int)].collect()
      .sortBy(_._2).map(_._1).toSeq
    // head {1,2,3} reordered by overlap: 2 (1.0), 3 (0.5), 1 (0.0); tail 4, 5 appended
    assert(out == Seq(2L, 3L, 1L, 4L, 5L))
  }

  test("KbConfig: ini parsing and env precedence") {
    import graft.config.KbConfig
    val ini = """
      |[DEFAULT]
      |query_top_k = 10
      |# comment
      |vector_dimensions = 32
      |[ALGORITHMS]
      |enable_reranking = false
      |""".stripMargin
    val c = KbConfig.load(ini, env = Map.empty)
    assert(c.queryTopK == 10 && c.vectorDimensions == 32 && !c.enableReranking)
    val c2 = KbConfig.load(ini, env = Map("GRAFT_QUERY_TOP_K" -> "99"))
    assert(c2.queryTopK == 99, "env must beat file")
    assert(KbConfig.load("", Map.empty).queryTopK == 50, "defaults")
  }

  test("deterministic embedder: column expression == mapPartitions provider") {
    import graft.embed.Embedder
    val df = Seq("hello world", "spark engine", "").toDF("text")
    val viaExpr = df.select(Embedder.deterministicEmbed(col("text"), 8).as("v"))
      .as[Seq[Float]].collect()
    val viaProvider = Embedder.Deterministic(8)
      .embedBatch(Seq("hello world", "spark engine", "")).map(_.toSeq)
    assert(viaExpr.map(_.toList).toSeq == viaProvider.map(_.toList))
    assert(viaExpr.forall(v => v.forall(x => x >= -1.0f && x <= 1.0f)))
  }
}
