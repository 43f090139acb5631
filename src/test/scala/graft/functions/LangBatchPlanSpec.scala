package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.embed.Embedder

/** F13 language code↔name mapping (driver fns + column twins) and M2
  * batch-size planning (column twin ≡ driver `optimalBatchSize`).
  */
class LangBatchPlanSpec extends SparkSpec {

  test("F13: isoCode accepts codes and names; fullLanguageName maps codes") {
    assert(TextFunctions.isoCode("en") == "en")
    assert(TextFunctions.isoCode("english") == "en")
    assert(TextFunctions.isoCode("indonesian") == "id")
    assert(TextFunctions.fullLanguageName("sv") == "swedish")
    assert(TextFunctions.LanguageCodes.size == 12)
    // round trip over the whole map, both directions
    TextFunctions.LanguageCodes.foreach { case (code, name) =>
      assert(TextFunctions.isoCode(name) == code)
      assert(TextFunctions.fullLanguageName(code) == name)
    }
  }

  test("F13: unknown language raises, matching the reference's ValueError") {
    assertThrows[IllegalArgumentException](TextFunctions.isoCode("klingon"))
    assertThrows[IllegalArgumentException](TextFunctions.fullLanguageName("xx"))
  }

  test("F13: column twins map both directions and yield NULL for unknowns") {
    import spark.implicits._
    val out = Seq("en", "zh", "und", "sv")
      .toDF("code")
      .select(col("code"),
        TextFunctions.languageName(col("code")).as("name"))
      .withColumn("rt", TextFunctions.languageIso(col("name")))
      .collect().map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
      .toSeq
    assert(out == Seq(
      ("en", Some("english"), Some("en")),
      ("zh", Some("chinese"), Some("zh")),
      ("und", None, None),
      ("sv", Some("swedish"), Some("sv"))))
  }

  test("M2: batchSizeCol matches driver optimalBatchSize per model and sample") {
    import spark.implicits._
    val samples = Seq(
      Seq("short text here", "two words", "  leading and trailing  "),
      Seq.fill(10)(Seq.fill(40)("word").mkString(" ")),       // 40-word docs
      Seq.fill(10)(Seq.fill(9000)("w").mkString(" ")),        // floor-at-1 for 8191-limit models
      Seq("a b c"))
    val models = Embedder.ModelTokenLimits.keys.toSeq :+ "custom-embed-unknown"
    for (sample <- samples; model <- models; maxB <- Seq(4, 100, 500)) {
      val expected = Embedder.optimalBatchSize(sample, model, maxB)
      val stats = sample.toDF("text")
        .agg(sum(Embedder.wordCount(col("text"))).as("sw"), count(lit(1)).as("n"))
      val limit = Embedder.ModelTokenLimits.getOrElse(model, 8191)
      val got = stats
        .select(Embedder.batchSizeCol(lit(model), lit(limit), col("sw"), col("n"), maxB))
        .first().getInt(0)
      assert(got == expected, s"model=$model maxB=$maxB sample=${sample.head.take(20)}")
    }
  }

  test("M2: gemini hard cap and empty-sample default") {
    // gemini limit 30720 over 40-word docs → byTokens ≈ 590, capped at 100
    val big = Seq.fill(5)(Seq.fill(40)("word").mkString(" "))
    assert(Embedder.optimalBatchSize(big, "gemini-embedding-001", 500) == 100)
    assert(Embedder.optimalBatchSize(Nil, "text-embedding-3-small", 500) == 500)
  }
}
