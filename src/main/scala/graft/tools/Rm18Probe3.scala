package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-query constraint probe for the r18 w6 selection: the Rm16 gate
  * pins per-query learned >= bm25 on the tf family; this prints that
  * margin per query alongside the three family means.
  */
object Rm18Probe3 {
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
    val sweep = args.drop(1).headOption
      .map(_.split(",").toSeq.map(_.toDouble))
      .getOrElse(Seq(0.2, 0.25, 0.3, 0.35, 0.4))
    for (w6 <- sweep) {
      val m = LogisticScorer(frozen.w.updated(6, w6), frozen.b)
      val perQ = Seq("tf", "prox", "sem").map { fam =>
        val rows = graft.queries.EngineQueries
          .plantedEvalWith(spark, sfDir, m, fam)
          .select("variant", "query_id", "ndcg").collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
        val qs = rows.keys.map(_._2).toSeq.distinct.sorted
        val detail = qs.map { q =>
          f"q$q ${rows(("learned", q))}%.4f/${rows(("bm25", q))}%.4f" +
            (if (rows(("learned", q)) >= rows(("bm25", q))) "" else " LOSS")
        }.mkString(" ")
        val lm = qs.map(q => rows(("learned", q))).sum / qs.size
        val bm = qs.map(q => rows(("bm25", q))).sum / qs.size
        f"$fam mean ${lm}%.4f/${bm}%.4f [$detail]"
      }
      println(s"[probe3] w6=$w6\n  " + perQ.mkString("\n  "))
    }
    spark.stop()
  }
}
