package graft.query

import org.scalatest.funsuite.AnyFunSuite

class AnswerGenSpec extends AnyFunSuite {

  test("answerBatch picks the same block Extractive picks, per query") {
    val spark = graft.SparkSpec.session
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val blocks = Seq(
      1L -> "spark runs joins with hash exchanges",
      2L -> "cats sleep most of the day",
      3L -> "parquet stores columns together")
    val queries = Seq(10L -> "how do cats spend the day",
      20L -> "how does spark run joins")
    val ctx = for ((qid, q) <- queries; (did, text) <- blocks)
      yield (qid, q, did, text)
    val df = ctx.toDF("query_id", "qtext", "doc_id", "text")
      .withColumn("qts", array_distinct(
        graft.functions.TextFunctions.tokenize(col("qtext"))))
    val got = AnswerGen.answerBatch(df, "query_id", "qts", "doc_id", "text")
      .select("query_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    queries.foreach { case (qid, q) =>
      // raw prompt whose paragraphs are exactly the blocks (a template
      // would glue its header into the first paragraph and skew its score)
      val expected = AnswerGen.Extractive().complete(
        blocks.map(_._2).mkString("\n\n") + s"\n\nQuestion: $q\nAnswer:")
      assert(got(qid) == expected, s"query $qid")
    }
  }

  test("buildPrompt substitutes context/query for every style; role prepends") {
    AnswerGen.Templates.keys.foreach { style =>
      val p = AnswerGen.buildPrompt(style, "CTX", "QRY")
      assert(p.contains("CTX") && p.contains("QRY"), s"style $style")
      assert(!p.contains("{context}") && !p.contains("{query}"))
    }
    val withRole = AnswerGen.buildPrompt("default", "c", "q", Some("terse expert"))
    assert(withRole.startsWith("[system: terse expert]"))
    assert(AnswerGen.buildPrompt("nope", "c", "q")
      == AnswerGen.buildPrompt("default", "c", "q"), "unknown style falls back")
  }

  test("extractive provider picks the highest-overlap context block") {
    val context =
      "spark runs joins with hash exchanges\n\ncats sleep most of the day\n\nparquet stores columns together"
    val ans = AnswerGen.answer("default", context, "how do cats spend the day")
    assert(ans.contains("cats sleep"), s"got: $ans")
  }

  test("extractive provider recovers the question from EVERY template style") {
    val context =
      "spark runs joins with hash exchanges\n\ncats sleep most of the day\n\nparquet stores columns together"
    AnswerGen.Templates.keys.foreach { style =>
      val ans = AnswerGen.answer(style, context, "how do cats spend the day")
      assert(ans.contains("cats sleep"),
        s"style $style scored on template prose, not the question: got '$ans'")
    }
  }

  test("context prose containing 'Question:' does not shadow the real framing") {
    // templates put the query framing AFTER the context, so the LAST
    // pattern match in the prompt must win — a context block quoting
    // "Question: ..." or "Q: ..." prose would otherwise hijack parsing
    // for every non-default style
    val context =
      "An FAQ entry said Question: do fish fly south in winter\n\n" +
        "cats sleep most of the day\n\nQ: what is parquet anyway"
    AnswerGen.Templates.keys.foreach { style =>
      val ans = AnswerGen.answer(style, context, "how do cats spend the day")
      assert(ans.contains("cats sleep"),
        s"style $style parsed a context-quoted question: got '$ans'")
    }
  }

  test("a framing marker QUOTED INSIDE the query does not hijack question recovery") {
    // patterns are line-anchored: the mid-line 'Q: 1.e4' inside the query
    // text must not out-rank the real framing, whose line-start match
    // carries the FULL question (a bare last-match would pick the inner
    // 'Q: ' and drive paragraph selection with the wrong tokens)
    val context =
      "openings like e4 develop the center quickly in chess games\n\n" +
        "parquet files store columns together"
    val query = "what does \"Q: 1.e4\" mean for chess openings"
    AnswerGen.Templates.keys.foreach { style =>
      val ans = AnswerGen.answer(style, context, query)
      assert(ans.contains("develop the center"),
        s"style $style mis-recovered the quoted-marker query: got '$ans'")
    }
  }

  test("a MULTI-LINE query with an embedded line-start marker keeps the full question") {
    // the default/instructive/conversational templates terminate the query
    // with a known suffix, so the question is marker→terminator even when
    // the query itself contains "\nQ: ..." lines — the generic last-match
    // would truncate to the embedded fragment and drive paragraph
    // selection with the wrong tokens
    // the PREFIX tokens decide the right block: with the full question the
    // transcript block wins (overlap 3/4); with the truncated embedded
    // fragment only the parquet block matches — so a truncation regression
    // flips the answer
    // the embedded marker is ANOTHER template's framing — a query line
    // reusing its own template's exact marker is inherently ambiguous
    // (indistinguishable from the real framing) and stays last-match
    val context =
      "explain this transcript notes\n\n" +
        "parquet files store many compressed binary columns rows groups pages footers"
    val query = "explain this transcript notes:\nAnswer briefly: parquet files question"
    Seq("default", "instructive", "conversational").foreach { style =>
      val ans = AnswerGen.answer(style, context, query)
      assert(ans.contains("transcript notes"),
        s"style $style truncated the multi-line query: got '$ans'")
    }
  }

  test("extractive provider does not exclude code/JSON blocks over a brace") {
    // only unsubstituted {context}/{query} placeholders disqualify a block
    val context =
      "unrelated prose about storage\n\ndef cats_sleep(): return {\"cats\": \"sleep all day\"}"
    val ans = AnswerGen.answer("default", context, "how do cats sleep")
    assert(ans.contains("cats_sleep"), s"brace block wrongly excluded: got '$ans'")
  }
}
