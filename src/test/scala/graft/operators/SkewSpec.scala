package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"key${i % 17}", i.toLong, i.toDouble)
  }.toDF("k", "n", "v")

  test("saltedAgg equals direct groupBy for sum/count/max") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"), max("n").as("max_n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    val salted = Skew.saltedAgg(skewed.withColumn("one", lit(1L)), "k", buckets = 8,
        Map("v" -> "sum", "one" -> "count", "n" -> "max"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(r.fieldIndex("sum_v")),
         r.getLong(r.fieldIndex("count_one")),
         r.getLong(r.fieldIndex("max_n")))).toMap
    // count of counts: each salt bucket contributes count(one); refold sums them
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (s, c, m)) =>
      val (s2, c2, m2) = salted(k)
      assert(math.abs(s2 - s) < 1e-9 && c2 == c && m2 == m, s"key $k: $salted vs $direct")
    }
  }

  test("saltedAgg tolerates MapType columns (hash() rejects maps; they are excluded)") {
    val withMap = skewed.withColumn("meta",
      map(lit("k"), col("k"))) // map<string,string> column
    val got = Skew.saltedAgg(withMap, "k", buckets = 4, Map("v" -> "sum"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = skewed.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("saltedJoin equals plain join and spreads the hot key across buckets") {
    val dim = Seq(("hot", "HOT"), ("key1", "K1"), ("key5", "K5")).toDF("k", "label")
    val plain = skewed.join(dim, "k").select("k", "n", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8)
      .select("k", "n", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    // the salt really spreads the hot key
    val spread = skewed.filter(col("k") === "hot")
      .withColumn("_salt", Skew.salt(8, col("k"), monotonically_increasing_id()))
      .select("_salt").distinct().count()
    assert(spread >= 6, s"hot key only hit $spread/8 salt buckets")
  }
}
