package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // target domain: physics-ish; raw corpus: two physics-like docs, two
  // sports docs, a null and an empty doc — ids stable
  private def target = Seq(
    (1000L, "quantum energy field theory"),
    (1001L, "energy field of the quantum vacuum"),
    (1002L, "field theory and quantum energy states")).toDF("doc_id", "text")

  private def raw = Seq(
    (1L, "the quantum field has energy"),
    (2L, "quantum theory of the energy field"),
    (3L, "football match goal score striker"),
    (4L, "the striker scored a goal in the match"),
    (5L, null.asInstanceOf[String]),
    (6L, "")).toDF("doc_id", "text")

  // ── independent naive reimplementation ─────────────────────────────────
  private def toks(s: String): Seq[String] =
    if (s == null) Seq.empty
    else s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def feats(s: String): Seq[String] = {
    val t = toks(s)
    val bi =
      if (t.isEmpty) Seq.empty[String]
      else (0 to math.max(t.size - 2, 0))
        .map(i => t.slice(i, i + 2).mkString(" ")).filter(_.nonEmpty)
    t ++ bi
  }

  private def poly(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  private def bucket(f: String): Int = (poly(f) % B).toInt

  private def lps(corpus: Seq[String]): Array[Long] = {
    val occ = corpus.flatMap(feats).map(bucket)
    val total = occ.size.toLong
    val counts = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Array.tabulate(B)(b => math.floor(
      math.log((counts.getOrElse(b, 0L) + 1).toDouble / (total + B).toDouble)
        * 1e6).toLong)
  }

  private def naiveWeights: Map[Long, (Long, Long)] = {
    val lpr = lps(raw.collect().map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq)
    val lpt = lps(target.collect().map(_.getString(1)).toSeq)
    raw.collect().map { r =>
      val f = feats(if (r.isNullAt(1)) null else r.getString(1))
      r.getLong(0) -> (f.size.toLong, f.map(x => lpt(bucket(x)) - lpr(bucket(x))).sum)
    }.toMap
  }

  test("importanceWeights equals the naive reimplementation doc for doc") {
    val got = Dsir.importanceWeights(raw, "doc_id", "text", target, "text", B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naiveWeights, s"got $got expected $naiveWeights")
  }

  test("target-like raw docs outweigh off-domain docs; degenerate docs score 0") {
    val w = Dsir.importanceWeights(raw, "doc_id", "text", target, "text", B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(1L) > w(3L) && w(1L) > w(4L), s"physics doc must outrank sports: $w")
    assert(w(2L) > w(3L) && w(2L) > w(4L), s"physics doc must outrank sports: $w")
    assert(w(5L) == 0L && w(6L) == 0L, s"null/empty text scores 0: $w")
    val nf = Dsir.importanceWeights(raw, "doc_id", "text", target, "text", B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nf(5L) == 0L && nf(6L) == 0L, s"null/empty text has no features: $nf")
  }

  test("resample takes the weight-descending head with id tie-break") {
    val w = Dsir.importanceWeights(raw, "doc_id", "text", target, "text", B)
    val ids = Dsir.resample(w, "doc_id", 2).select("doc_id").as[Long].collect().toSeq
    val expected = naiveWeights.toSeq
      .sortBy { case (id, (_, s)) => (-s, id) }.take(2).map(_._1)
    assert(ids == expected, s"got $ids expected $expected")
  }

  test("bucketLogProbs is dense over [0, B) and Laplace-floored on unseen buckets") {
    val lp = Dsir.bucketLogProbs(target, "text", B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp.size == B && lp.keySet == (0L until B.toLong).toSet)
    val expected = lps(target.collect().map(_.getString(1)).toSeq)
    (0 until B).foreach(b => assert(lp(b.toLong) == expected(b),
      s"bucket $b: got ${lp(b.toLong)} expected ${expected(b)}"))
  }

  test("dsirScore/dsirBuckets: 200-doc seeded unicode sweep against the naive walk") {
    import org.apache.spark.sql.functions.{col => c}
    val rnd = new scala.util.Random(20260815L)
    // no empty tokens: the production tokenizer never emits them (input
    // contract of the feature walk)
    val pool = Vector("alpha", "beta9", "x", "héllo", "中文", "𝕏ray", "tok_en",
      "ümlaut", "42", "a b", "ZZ", "ñoño")
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(pool(rnd.nextInt(pool.size))))
    }
    val B2 = 32
    val ratio = Array.fill(B2)(rnd.nextLong() % 1000000L)
    def polyU(str: String): Long = {
      var h = 0L; var ci = 0
      while (ci < str.length) {
        val cp = str.codePointAt(ci)
        h = (h * 31 + cp) % 1000000007L
        ci += Character.charCount(cp)
      }
      h
    }
    def naive(toks: Seq[String]): (Long, Long) = {
      if (toks.isEmpty) return (0L, 0L)
      val uni = toks
      val nSh = if (toks.size < 2) 1 else toks.size - 1
      val bi = (0 until nSh).map(i =>
        toks.slice(i, i + 2).mkString(" ")).filter(_.nonEmpty)
      val fs = uni ++ bi
      (fs.size.toLong, fs.map(f => ratio((polyU(f) % B2).toInt)).sum)
    }
    val df = docs.toDF("id", "toks")
    val got = df.select(c("id"),
        graft.functions.FastFunctions.dsirScore(c("toks"), B2, ratio).as("s"),
        graft.functions.FastFunctions.dsirBuckets(c("toks"), B2).as("b"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    docs.foreach { case (id, toks) =>
      val (nf, sc) = naive(toks)
      val (score, buckets) = got(id)
      assert(score == Seq(nf, sc), s"doc $id toks=$toks: got $score want ($nf,$sc)")
      assert(buckets.size == nf, s"doc $id bucket count")
      assert(buckets.forall(b => b >= 0 && b < B2))
    }
  }
}
