package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Scratch diagnostic main (not part of the library surface). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def timed(name: String)(f: => Unit): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s ${dt}%8.3f s  jobs=${jobs.get() - j0}")
    }
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = args.toSeq
    (1 to 3).foreach { pass =>
      println(s"[probe] pass $pass")
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        timed(n) { fn(spark, sfDir).count(); () }
      }
    }
    // plan shape of batch50
    val df = SparkEntry.queries("sim_knn_batch50")(spark, sfDir)
    println(df.queryExecution.optimizedPlan.toString.take(2000))
    spark.stop()
  }
}
