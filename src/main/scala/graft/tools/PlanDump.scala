package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the r18 optimization round's plan-evidence capture
  * (`plans/r18/<query>_{before,after}.txt`).
  *
  * Usage: `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name>[,<name>...]`
  * — `<name>` may also be `ALL`. The session mirrors Bench's config (same
  * master/core count via SPARK_GRAFT_CPUS, same shuffle partitions, AQE
  * left at its default) so the captured initial plan is the one Bench
  * executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <names|ALL>")
    val Array(sfDir, outDir, suffix, namesArg) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    val names =
      if (namesArg == "ALL") all.keys.toSeq.sorted
      else namesArg.split(",").toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = all.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val out = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(out,
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $out (${plan.length} chars)")
    }
    spark.stop()
  }
}
