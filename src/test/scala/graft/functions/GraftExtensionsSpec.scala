package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** The extension-registered SQL functions must equal the Column API — one
  * engine, two surfaces.
  */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val sqlSession: SparkSession = {
    // a sibling session on the same SparkContext, built WITH the extensions
    // (the shared test session predates them)
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("graft_cosine / graft_dot are callable from pure SQL and match the Column API") {
    val row = sqlSession.sql(
      """SELECT graft_cosine(cast(array(1.0, 0.0) as array<float>),
        |                    cast(array(1.0, 0.0) as array<float>)) AS c,
        |       graft_dot(cast(array(1.0, 2.0) as array<float>),
        |                 cast(array(3.0, 4.0) as array<float>)) AS d""".stripMargin)
      .collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getDouble(1) == 11.0)
  }

  test("graft_polyhash / graft_simhash60 / graft_minhash_sig from SQL") {
    val row = sqlSession.sql(
      """SELECT graft_polyhash('hello') AS h,
        |       graft_simhash60(array('hello', 'world')) AS s,
        |       graft_minhash_sig(array('a','b','c','d','e'), 3, 4) AS m""".stripMargin)
      .collect().head
    // cross-check against direct helpers
    import org.apache.spark.unsafe.types.UTF8String
    assert(row.getLong(0) == HashAlgos.polyHash(UTF8String.fromString("hello"), 31L))
    assert(row.getLong(1) != 0L)
    assert(row.getSeq[Long](2).length == 4)
  }

  test("graft_tokenize / graft_word_shingles / graft_char_ngrams from SQL") {
    val row = sqlSession.sql(
      """SELECT graft_tokenize('The quick FOX') AS t,
        |       graft_tokenize_bm25('The quick FOX') AS tb,
        |       graft_word_shingles(array('a','b','c','d'), 3) AS ws,
        |       graft_char_ngrams('abcd', 3) AS ng""".stripMargin)
      .collect().head
    assert(row.getSeq[String](0) == Seq("the", "quick", "fox"))
    assert(row.getSeq[String](1) == Seq("quick", "fox"))
    assert(row.getSeq[String](2) == Seq("a b c", "b c d"))
    assert(row.getSeq[Long](3).length == 2) // 'abc', 'bcd'
  }

  test("graft_word_repetition / graft_dsir_buckets from SQL") {
    val row = sqlSession.sql(
      """SELECT graft_word_repetition(array('a','b','a','b','a'), 2) AS r,
        |       graft_dsir_buckets(array('the','cat'), 64) AS b""".stripMargin)
      .collect().head
    // shingles: (a b, b a, a b, b a) -> 2 distinct of 4 -> 0.5
    assert(row.getDouble(0) == 0.5)
    val b = row.getSeq[Long](1)
    // 2 unigrams + 1 bigram, each in [0, 64)
    assert(b.length == 3 && b.forall(x => x >= 0 && x < 64))
  }

  test("unknown-typed input fails analysis with the expression name") {
    val e = intercept[Exception] {
      sqlSession.sql("SELECT graft_cosine(1, 2)").collect()
    }
    assert(e.getMessage.contains("graft_cosine"))
  }
}
