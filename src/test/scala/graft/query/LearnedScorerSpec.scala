package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The learned rerank scorer ([[Rerank.LogisticScorer]]) — proof that the
  * [[Rerank.Scorer]] seam takes a trained model end to end (the reference
  * swaps in ms-marco-MiniLM at this exact seam, rerank_manager.py:133-277):
  * training is deterministic, the learned column scores inside the same
  * head/tail rerank plumbing as the lexical default, and the learned
  * ordering genuinely DIFFERS from the lexical one where the features
  * disagree — in particular the tf-mass feature lets the learned model
  * separate documents the set-based lexical scorer ties. The m7 oracle
  * queries keep running on [[Rerank.LexicalScorer]] — this spec changes no
  * serving default.
  */
class LearnedScorerSpec extends SparkSpec {
  import spark.implicits._

  private val queryTerms = Seq("spark", "join", "filter", "window")

  // the canonical seeded relevance generator — shared with the
  // m7_rerank_learned oracle query, which embeds the trained weights as
  // literals in BOTH engines
  private def trainingSet(seed: Long): Seq[(Array[Double], Int)] =
    Rerank.LogisticScorer.syntheticRelevance(queryTerms, seed)

  test("training is deterministic and separates the relevance classes") {
    val m1 = Rerank.LogisticScorer.train(trainingSet(42))
    val m2 = Rerank.LogisticScorer.train(trainingSet(42))
    assert(m1.w.toSeq == m2.w.toSeq && m1.b == m2.b)
    // held-out accuracy: a different seed's examples classify correctly
    val held = trainingSet(7)
    val correct = held.count { case (f, y) =>
      val z = f.zip(m1.w).map { case (fi, wi) => fi * wi }.sum + m1.b
      val p = 1.0 / (1.0 + math.exp(-z))
      (p >= 0.5) == (y == 1)
    }
    assert(correct.toDouble / held.size >= 0.95,
      s"held-out accuracy ${correct.toDouble / held.size}")
  }

  test("the trained model loads on BOTH signals the lexical scorer cannot see") {
    // the two-family fixture (r17) labels one half by tf MASS and the
    // other by ordered-bigram PROXIMITY (tf mass drawn label-independently
    // there), so the trained weights must be positive on both f3 and f5 —
    // and those two must carry the largest loads, since every other
    // feature varies independently of the labels in at least one family
    val m = Rerank.LogisticScorer.train(trainingSet(42))
    assert(m.w(3) > 0.0, s"tf-mass weight ${m.w(3)} must be positive")
    assert(m.w(5) > 0.0, s"proximity weight ${m.w(5)} must be positive")
    val top2 = m.w.map(math.abs).zipWithIndex.sortBy(-_._1).take(2).map(_._2).toSet
    assert(top2 == Set(3, 5),
      s"tf-mass and proximity must carry the largest |weights|: ${m.w.toSeq}")
  }

  test("driver-side features mirror the serving feature columns exactly") {
    val m = Rerank.LogisticScorer.train(trainingSet(42))
    // repeated tokens exercise the tf-mass occurrence count; varying
    // scores exercise the retrieval feature
    val docs = Seq(
      (1L, 12.5, "spark spark join gamma delta spark"),
      (2L, 3.25, "spark join filter window alpha beta join"),
      (3L, 0.0, "alpha beta gamma"),
      (4L, 7.75, "")).toDF("doc_id", "score", "text")
    val got = docs.select(col("doc_id"),
        m.scoreWithRetrieval("spark join filter window", col("text"),
          col("score")).as("s"))
      .as[(Long, Double)].collect().toMap
    docs.as[(Long, Double, String)].collect().foreach { case (id, s, text) =>
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val want = m.scoreValue(queryTerms, toks, s)
      assert(math.abs(got(id) - want) < 1e-12, s"doc $id: ${got(id)} vs $want")
    }
  }

  test("learned rerank order follows tf mass where the lexical scorer ties") {
    val m = Rerank.LogisticScorer.train(trainingSet(42))
    // both docs have the SAME distinct token set {spark, join, filter, x}
    // modulo one noise token — identical jaccard/coverage/length, so the
    // lexical scorer ties them and falls back to doc_id order. Doc 2
    // repeats the query terms (tf mass 6 vs 3): the learned model must
    // promote it despite the lexical tie-break preferring doc 1.
    val hits = Seq(
      (1L, 10.0, "spark join filter alpha"),
      (2L, 9.0, "spark spark join join filter filter beta"))
      .toDF("doc_id", "score", "text")
    val q = "spark join filter window"
    def order(scorer: org.apache.spark.sql.Column): Seq[Long] =
      Rerank.rerankHead(hits, "score", topK = 2, scorer)
        .orderBy("final_rank").select("doc_id").as[Long].collect().toSeq
    val lex = order(Rerank.LexicalScorer.score(q, col("text")))
    // equal retrieval feature isolates the tf-mass effect
    val learned = order(m.scoreWithRetrieval(q, col("text"), lit(1.0)))
    assert(lex == Seq(1L, 2L), s"lexical order: $lex")
    assert(learned == Seq(2L, 1L), s"learned order: $learned")
  }

  test("learned rerank promotes ordered adjacency where every unordered feature ties") {
    val m = Rerank.LogisticScorer.train(trainingSet(42))
    // identical distinct token SETS, identical tf mass (3), identical
    // length — docs differ ONLY in token ORDER: doc 2 carries the query
    // bigrams "spark join"/"join filter" adjacent, doc 1 scatters them.
    // Every set/tf feature ties, so only the f5 proximity weight can
    // reorder — the de-circularization feature (verdict r16 #2).
    val hits = Seq(
      (1L, 10.0, "spark alpha join beta filter"),
      (2L, 9.0, "spark join filter beta alpha"))
      .toDF("doc_id", "score", "text")
    val q = "spark join filter window"
    def order(scorer: org.apache.spark.sql.Column): Seq[Long] =
      Rerank.rerankHead(hits, "score", topK = 2, scorer)
        .orderBy("final_rank").select("doc_id").as[Long].collect().toSeq
    assert(order(Rerank.LexicalScorer.score(q, col("text"))) == Seq(1L, 2L))
    assert(order(m.scoreWithRetrieval(q, col("text"), lit(1.0))) == Seq(2L, 1L))
  }
}
