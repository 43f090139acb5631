package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stored-vs-computed late-interaction serve attribution: is the stored
  * batch serve's gap over the warm computed path the per-wave parquet
  * re-scan (fix: persist across waves) or something else?
  */
object Rm18Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.LateInteraction
    val dir = "/tmp/graft_scale/late_zipf_100x"
    val zd = spark.read.parquet("/tmp/graft_scale/zipfdocs_100x.parquet")
    def zterm(r: Int) = s"w$r"
    val batch: Seq[(Long, String)] = (0 until 20).map(i =>
      ((i + 1).toLong,
        (0 until 5).map(j => zterm(101 + i * 500 + j * 100)).mkString(" ")))
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p4] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($r)")
    }
    // warmup slice first so every row below is JIT-warm
    val ixw = LateInteraction.readIndex(spark, dir)
    t("warmup slice")(LateInteraction.maxSimTopKBatchStored(
      ixw.copy(dtok = ixw.dtok.limit(100000)), batch, k = 10).count())
    t("stored as-is (1)")(LateInteraction.maxSimTopKBatchStored(
      LateInteraction.readIndex(spark, dir), batch, k = 10).count())
    t("stored as-is (2)")(LateInteraction.maxSimTopKBatchStored(
      LateInteraction.readIndex(spark, dir), batch, k = 10).count())
    locally {
      val ix = LateInteraction.readIndex(spark, dir)
      val p = ix.dtok.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("stored dtok-persisted (incl. materialize)")(
        LateInteraction.maxSimTopKBatchStored(ix.copy(dtok = p), batch, k = 10).count())
      t("stored dtok-persisted (warm cache)")(
        LateInteraction.maxSimTopKBatchStored(ix.copy(dtok = p), batch, k = 10).count())
      p.unpersist()
    }
    t("computed warm (1)")(LateInteraction.maxSimTopKBatch(
      zd, "doc_id", "text", batch, k = 10).count())
    t("computed warm (2)")(LateInteraction.maxSimTopKBatch(
      zd, "doc_id", "text", batch, k = 10).count())
    spark.stop()
  }
}
