package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-provided parquet tables.
  *
  * Mirrors the reference's notion of a knowledgebase directory
  * (`/root/reference/README.md:353-359`): a directory of named tables. Here a
  * "KB" is simply a directory of parquet files; at cluster scale these would
  * be partitioned/bucketed table paths behind a catalog.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory. Filters and projections on the
    * result push down to the parquet scan (verified via .explain in specs).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
}
