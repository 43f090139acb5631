package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContextWindowSpec extends SparkSpec {
  import spark.implicits._

  private val chunks = (0 to 9).map(i => ("doc_a", i, s"a$i")) ++
    (0 to 5).map(i => ("doc_b", i, s"b$i"))

  test("expand returns the clamped band around each hit") {
    val c = chunks.toDF("sourcedoc", "sid", "text")
    val hits = Seq(("doc_a", 1), ("doc_b", 5)).toDF("sourcedoc", "sid")
    val got = ContextWindow.expand(c, hits, scope = 2)
      .select("sourcedoc", "sid").as[(String, Int)].collect().toSet
    // doc_a hit sid=1 -> [0,3] (clamped at 0); doc_b hit sid=5 -> [3,7] but max sid is 5
    assert(got == Set(("doc_a", 0), ("doc_a", 1), ("doc_a", 2), ("doc_a", 3),
      ("doc_b", 3), ("doc_b", 4), ("doc_b", 5)))
  }

  test("overlapping windows dedup to one row per chunk") {
    val c = chunks.toDF("sourcedoc", "sid", "text")
    val hits = Seq(("doc_a", 2), ("doc_a", 3)).toDF("sourcedoc", "sid")
    val got = ContextWindow.expand(c, hits, scope = 2).select("sourcedoc", "sid").collect()
    assert(got.length == got.distinct.length)
    assert(got.length == 6) // union [0,4] + [1,5] = [0,5]
  }

  test("adaptiveScope halves below threshold with floor 1") {
    val df = Seq(0.9, 0.5, 0.1).toDF("score")
    val got = df.select(ContextWindow.adaptiveScope(col("score"), scope = 4).as("s"))
      .as[Int].collect().toSeq
    assert(got == Seq(4, 2, 2))
    val floor = df.select(ContextWindow.adaptiveScope(col("score"), scope = 1).as("s"))
      .as[Int].collect().toSeq
    assert(floor == Seq(1, 1, 1))
  }

  test("consecutiveGroups increments on sid gaps per sourcedoc") {
    val rows = Seq(("d", 0), ("d", 1), ("d", 3), ("d", 4), ("d", 7), ("e", 5))
      .toDF("sourcedoc", "sid")
    val got = ContextWindow.consecutiveGroups(rows)
      .select("sourcedoc", "sid", "group_id")
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("d", 0, 1L), ("d", 1, 1L), ("d", 3, 2L), ("d", 4, 2L),
      ("d", 7, 3L), ("e", 5, 1L)))
  }
}
