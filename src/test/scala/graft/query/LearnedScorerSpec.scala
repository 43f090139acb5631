package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The learned rerank scorer ([[Rerank.LogisticScorer]]) — proof that the
  * [[Rerank.Scorer]] seam takes a trained model end to end (the reference
  * swaps in ms-marco-MiniLM at this exact seam, rerank_manager.py:133-277):
  * training is deterministic, the learned column scores inside the same
  * head/tail rerank plumbing as the lexical default, and the learned
  * ordering genuinely DIFFERS from the lexical one where the features
  * disagree. The m7 oracle queries keep running on [[Rerank.LexicalScorer]]
  * — this spec changes no serving default.
  */
class LearnedScorerSpec extends SparkSpec {
  import spark.implicits._

  private val queryTerms = Set("spark", "join", "filter", "window")

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

  test("driver-side features mirror the serving feature columns exactly") {
    val m = Rerank.LogisticScorer.train(trainingSet(42))
    val docs = Seq(
      (1L, "spark join gamma delta"),
      (2L, "spark join filter window alpha beta"),
      (3L, "alpha beta gamma"),
      (4L, "")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        m.score("spark join filter window", col("text")).as("s"))
      .as[(Long, Double)].collect().toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty).toSet
      val f = Rerank.LogisticScorer.featuresOf(queryTerms, toks)
      val z = f.zip(m.w).map { case (fi, wi) => fi * wi }.sum + m.b
      val want = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(got(id) - want) < 1e-12, s"doc $id: ${got(id)} vs $want")
    }
  }

  test("learned rerank order differs from lexical where jaccard and coverage disagree") {
    val m = Rerank.LogisticScorer.train(trainingSet(42))
    // doc 1: 3 of 4 query terms + 3 noise -> jaccard 3/7, coverage 0.75
    // doc 2: exactly 2 query terms       -> jaccard 2/4, coverage 0.50
    // lexical ranks doc 2 first (0.50 > 0.43); the coverage-trained model
    // must rank doc 1 first
    val hits = Seq(
      (1L, 10.0, "spark join filter alpha beta gamma"),
      (2L, 9.0, "spark join")).toDF("doc_id", "score", "text")
    val q = "spark join filter window"
    def order(scorer: Rerank.Scorer): Seq[Long] =
      Rerank.rerankHead(hits, "score", topK = 2, scorer.score(q, col("text")))
        .orderBy("final_rank").select("doc_id").as[Long].collect().toSeq
    val lex = order(Rerank.LexicalScorer)
    val learned = order(m)
    assert(lex == Seq(2L, 1L), s"lexical order: $lex")
    assert(learned == Seq(1L, 2L), s"learned order: $learned")
  }
}
