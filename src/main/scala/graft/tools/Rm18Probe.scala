package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch receipt probe for the r18 dense-feature weight sweep. */
object Rm18Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.query.Rerank.LogisticScorer
    val frozen = LogisticScorer.pretrainedFrozen
    val sweep = args.drop(1).headOption.map(_.split(",").toSeq.map(_.toDouble)).getOrElse(Seq(0.0, 0.1, 0.2, 0.3, 0.4, 0.6, 0.809))
    for (w6 <- sweep) {
      val m = LogisticScorer(frozen.w.updated(6, w6), frozen.b)
      val res = Seq("tf", "prox", "sem").map { fam =>
        val d = graft.queries.EngineQueries.plantedEvalWith(spark, sfDir, m, fam)
          .groupBy("variant").agg(avg("ndcg")).collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        f"$fam=${d("learned")}%.4f(bm25 ${d("bm25")}%.4f)"
      }
      println(s"[probe] w6=$w6  " + res.mkString(" "))
    }
    spark.stop()
  }
}
