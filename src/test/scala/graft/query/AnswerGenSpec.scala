package graft.query

import org.scalatest.funsuite.AnyFunSuite

class AnswerGenSpec extends AnyFunSuite {

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
}
