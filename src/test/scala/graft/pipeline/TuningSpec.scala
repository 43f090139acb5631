package graft.pipeline

import graft.SparkSpec
import graft.sources.KbStorage

class TuningSpec extends SparkSpec {
  import spark.implicits._

  test("advise scales shuffle partitions with input and clamps sanely") {
    val small = Tuning.advise(inputBytes = 1L << 30, cores = 32) // 1 GB
    assert(small.shufflePartitions == 64, "floor = 2 x cores")
    val big = Tuning.advise(inputBytes = 100L << 40, cores = 32) // 100 TB
    assert(big.shufflePartitions == 4000, "cap at 4000")
    val mid = Tuning.advise(inputBytes = 64L << 30, cores = 32,
      executorMemBytes = 32L << 30) // 64 GB input, 32 GB mem
    assert(mid.shufflePartitions == 1024, "64GB / 64MB")
    assert(mid.enableHybridSearch)
    assert(!Tuning.advise(1L << 30, 32, 8L << 30).enableHybridSearch,
      "hybrid off below the reference's 16GB low tier")
  }

  test("apply sets the session confs") {
    val prev = (spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      Tuning.apply(spark, Tuning.advise(10L << 30, 16))
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "160")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._2)
    }
  }

  test("verifyLayout: healthy bucketed table passes, plain table is flagged") {
    val chunks = Seq(("a", 0, "t")).toDF("sourcedoc", "sid", "text")
    spark.sql("DROP TABLE IF EXISTS vt_good")
    spark.sql("DROP TABLE IF EXISTS vt_plain")
    KbStorage.writeChunks(chunks, "vt_good", buckets = 2)
    chunks.write.mode("overwrite").saveAsTable("vt_plain")
    assert(Tuning.verifyLayout(spark, "vt_good").isEmpty)
    val flagged = Tuning.verifyLayout(spark, "vt_plain")
    assert(flagged.exists(_.contains("no bucket spec")), flagged.mkString("; "))
    val missing = Tuning.verifyLayout(spark, "vt_nonexistent",
      Some("/tmp/does/not/exist"))
    assert(missing.size == 2)
  }
}
