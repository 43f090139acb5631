package graft.operators

import graft.SparkSpec

class NgramJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "blk1", "the quick brown fox"),
    (2L, "blk1", "the quick brown foxes"),   // near-dup of 1
    (3L, "blk1", "entirely different words"),
    (4L, "blk2", "the quick brown fox"),     // dup of 1 but other block
    (5L, "blk2", "zq")                       // too short for a trigram
  ).toDF("doc_id", "source", "text")

  test("near-dups in the same block are found; cross-block pairs never compared") {
    val pairs = Dedup.charNgramJaccard(docs, "doc_id", "text", "source",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "near-identical texts in one block")
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(1L, 4L) },
      "identical text in different blocks is not a candidate")
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
      "dissimilar text below threshold")
  }

  test("jaccard value matches a hand computation") {
    def grams(s: String): Set[String] =
      (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
    val a = grams("the quick brown fox")
    val b = grams("the quick brown foxes")
    val want = a.intersect(b).size.toDouble / a.union(b).size.toDouble
    val got = Dedup.charNgramJaccard(docs, "doc_id", "text", "source", 3, 0.0)
      .filter("doc_a = 1 and doc_b = 2").collect()(0).getDouble(2)
    assert(math.abs(got - want) < 1e-9)
  }
}
