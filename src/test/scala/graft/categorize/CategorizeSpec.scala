package graft.categorize

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CategorizeSpec extends SparkSpec {
  import spark.implicits._

  test("sampleChunks takes top/mid/bottom per sourcedoc") {
    val chunks = (0 until 30).map(i => ("d", i)).toDF("sourcedoc", "sid")
    val got = Categorize.sampleChunks(chunks, n = 3)
      .select("sid").as[Int].collect().sorted.toSeq
    assert(got.take(3) == Seq(0, 1, 2), "top-3")
    assert(got.takeRight(3) == Seq(27, 28, 29), "bottom-3")
    assert(got.size == 9, s"3+3+3 samples, got $got")
    assert(got.slice(3, 6).forall(s => s > 5 && s < 25), s"middle block: $got")
  }

  test("short docs are sampled completely without duplicates") {
    val chunks = (0 until 4).map(i => ("d", i)).toDF("sourcedoc", "sid")
    val got = Categorize.sampleChunks(chunks, n = 3)
      .select("sid").as[Int].collect().toSeq
    assert(got.distinct.size == got.size)
  }

  test("keywordCategorize assigns primary + sorted categories above threshold") {
    val chunks = Seq(
      ("a", 0, "spark query join filter window sql engine"),
      ("a", 1, "more query filter text"),
      ("b", 0, "parquet columnar disk file cache"),
      ("c", 0, "nothing matching whatsoever zzz")).toDF("sourcedoc", "sid", "text")
    val got = Categorize.keywordCategorize(Categorize.sampleChunks(chunks), "text")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getSeq[String](2))).toMap
    assert(got("a")._1 == "query-engine")
    assert(got("b")._1 == "storage")
    assert(!got.contains("c"), "below-threshold docs get no categories")
  }

  test("dedupLabels merges near-identical labels to one canonical") {
    val labels = Seq("data processing", "Data Processing!", "query engine", "unrelated")
      .toDF("label")
    val got = Categorize.dedupLabels(labels)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("data processing") == got("Data Processing!"))
    assert(got("unrelated") == "unrelated")
  }

  test("importCategories attaches categories to every chunk of the doc") {
    val chunks = Seq(("a", 0), ("a", 1), ("b", 0)).toDF("sourcedoc", "sid")
    val cats = Seq(("a", "tech", Seq("tech"))).toDF("sourcedoc", "primary_category", "categories")
    val got = Categorize.importCategories(chunks, cats)
    assert(got.filter(col("sourcedoc") === "a")
      .filter(col("primary_category") === "tech").count() == 2)
    assert(got.filter(col("sourcedoc") === "b")
      .filter(col("primary_category").isNull).count() == 1)
  }

  test("extractJson strips fences/prose and repairs trailing commas") {
    val got = Seq("junk before {\"a\": [1, 2,], \"b\": 3,} junk after")
      .toDF("t").select(Categorize.extractJson(col("t"))).as[String].first()
    assert(got == "{\"a\": [1, 2], \"b\": 3}")
  }
}
