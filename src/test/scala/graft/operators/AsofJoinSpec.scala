package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (id, key, ts); right: (key, ts, price, qty)
  private def left = Seq(
    (1L, "a", 100L), (2L, "a", 205L), (3L, "a", 50L),
    (4L, "b", 300L), (5L, "c", 10L)
  ).toDF("id", "k", "ts")

  private def right = Seq(
    ("a", 100L, 1.0, 10L), ("a", 200L, 2.0, 20L), ("a", 300L, 3.0, 30L),
    ("b", 250L, 9.0, 90L)
  ).toDF("k", "ts", "price", "qty")

  test("asofLast picks the latest right row at-or-before each left ts") {
    val got = AsofJoin.asofLast(left, right, "k", "ts", Seq("ts", "price", "qty"))
      .select("id", "asof_ts", "asof_price", "asof_qty")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == (Some(100L), Some(1.0), Some(10L)), "equal ts matches")
    assert(got(2L) == (Some(200L), Some(2.0), Some(20L)), "strictly-before wins")
    assert(got(3L) == (None, None, None), "no right row before -> nulls")
    assert(got(4L) == (Some(250L), Some(9.0), Some(90L)))
    assert(got(5L) == (None, None, None), "key with no right rows")
  }

  test("asofLast keeps every left row and all left columns") {
    val out = AsofJoin.asofLast(left.withColumn("extra", col("id") * 2),
      right, "k", "ts", Seq("price"))
    assert(out.count() == 5)
    assert(out.columns.toSet ==
      Set("id", "k", "ts", "extra", "asof_price"))
  }

  test("NULL fields of the latest right row are NOT backfilled from older rows") {
    // true as-of semantics: every field comes from the single latest row —
    // per-column ignoreNulls fills would blend (price from ts=1, qty from
    // ts=2) into a row that never existed
    val r = Seq(("a", 1L, Option(5.0), Option.empty[Long]),
      ("a", 2L, Option.empty[Double], Option(7L)))
      .toDF("k", "ts", "price", "qty")
    val l = Seq((1L, "a", 3L)).toDF("id", "k", "ts")
    val got = AsofJoin.asofLast(l, r, "k", "ts", Seq("price", "qty"))
      .select("asof_price", "asof_qty").collect()(0)
    assert(Option(got.get(0)).isEmpty, "price must be the latest row's NULL")
    assert(got.getLong(1) == 7L)
  }

  test("asofLast plans exactly ONE shuffle and no join operator") {
    val plan = AsofJoin.asofLast(left, right, "k", "ts", Seq("price"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("asofLast matches the naive range-join result on random data") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i => (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
      .toDF("id", "k", "ts")
    // unique (k, ts) on the right per the determinism contract
    val r = (1 to 200).map(i => (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "ts", "v")
    val got = AsofJoin.asofLast(l, r, "k", "ts", Seq("v"))
      .select("id", "asof_v").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    val naive = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && col("l.ts") >= col("r.ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("r.ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("id"), col("r.v")).collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(got == naive)
  }

  test("asofLast rejects reserved and colliding column names") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofLast(left.withColumn("_side", lit(0)), right, "k", "ts", Seq("price"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofLast(left, right.withColumn("_asof_row", lit(0)), "k", "ts", Seq("price"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofLast(left.withColumn("asof_price", lit(0.0)), right, "k", "ts", Seq("price"))
    }
  }
}
