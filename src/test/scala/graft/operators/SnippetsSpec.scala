package graft.operators

import graft.SparkSpec

/** Snippet extraction ([[Snippets]]): window coverage counting, earliest
  * -window tie-break, clamped slices, and the no-match contract.
  */
class SnippetsSpec extends SparkSpec {
  import spark.implicits._

  test("picks the window covering the most distinct query terms") {
    val filler = (1 to 20).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      // spark early, but the dense window has spark+join+filter together
      (1L, s"spark $filler spark join filter $filler"),
      (2L, s"join $filler"),
      (3L, "no relevant terms at all")).toDF("doc_id", "text")
    val got = Snippets.bestSnippets(docs, "doc_id", "text",
        "spark join filter window", 10)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L)) // doc 3 has no match row
    val (_, start, n, snippet) = got.head
    assert(n == 3L)
    assert(start == 21L) // the second 'spark', 0-based: 1 + 20 fillers
    assert(snippet.startsWith("spark join filter"))
    assert(snippet.split(" ").length == 10)
  }

  test("tie on coverage -> earliest window; slice clamps at doc end") {
    val docs = Seq((1L, "spark a b spark")).toDF("doc_id", "text")
    val got = Snippets.bestSnippets(docs, "doc_id", "text", "spark", 10)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 0L, 1L, "spark a b spark")))
  }

  test("ranking is (n_terms desc, start_pos, doc_id) and k-bounded") {
    val docs = Seq(
      (1L, "spark join"),
      (2L, "spark"),
      (3L, "spark join"),
      (4L, "join spark")).toDF("doc_id", "text")
    val got = Snippets.bestSnippets(docs, "doc_id", "text", "spark join", 3)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 3L, 4L)) // all n=2, pos 0; doc 2 cut by k
  }
}
