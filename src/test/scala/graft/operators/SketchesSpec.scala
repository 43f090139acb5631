package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(n: Int) =
    (1 to n).map(i => ("g", i.toLong)).toDF("g", "x")
      .select(col("g"), Sketches.uniformHash(concat(lit("u"), col("x").cast("string"))).as("h"))

  test("exact below k: n_kept is the true distinct count and est is exact") {
    val df = hashed(40)
    val row = df.groupBy("g").agg(Sketches.kmv(64)(col("h")).as("sk"))
      .select(col("sk.n_kept"), Sketches.estimate(col("sk"), 64)).head()
    assert(row.getInt(0) == 40)
    assert(row.getDouble(1) == 40.0)
  }

  test("duplicate inputs don't inflate the sketch") {
    val df = hashed(40).union(hashed(40)).union(hashed(10))
    val row = df.groupBy("g").agg(Sketches.kmv(64)(col("h")).as("sk"))
      .select(Sketches.estimate(col("sk"), 64)).head()
    assert(row.getDouble(0) == 40.0)
  }

  test("partition invariance: same summary for any repartitioning") {
    val df = hashed(5000)
    val expected = df.coalesce(1).groupBy("g")
      .agg(Sketches.kmv(64)(col("h")).as("sk"))
      .select(col("sk.n_kept"), col("sk.kth_hash")).head()
    for (parts <- Seq(2, 7, 32)) {
      val got = df.repartition(parts).groupBy("g")
        .agg(Sketches.kmv(64)(col("h")).as("sk"))
        .select(col("sk.n_kept"), col("sk.kth_hash")).head()
      assert(got == expected, s"parts=$parts")
    }
  }

  test("estimate error is within 4 standard errors at k=256") {
    val n = 20000
    val k = 256
    val row = hashed(n).groupBy("g").agg(Sketches.kmv(k)(col("h")).as("sk"))
      .select(Sketches.estimate(col("sk"), k)).head()
    val rel = math.abs(row.getDouble(0) - n) / n
    // SE ≈ 1/sqrt(k-2) ≈ 6.3%; 4·SE ≈ 25%
    assert(rel < 4.0 / math.sqrt(k - 2.0), s"relative error $rel")
  }
}
