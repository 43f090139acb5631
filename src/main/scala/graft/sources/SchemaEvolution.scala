package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema versioning (SURVEY §1.1 "Schema versioning", §1.3).
  *
  * The reference migrates its SQLite schema with versioned ALTERs (BM25
  * columns v1, categories v2, timestamps v3 —
  * `/root/reference/database/migrations.py:292-334`) and sniffs the live
  * schema with PRAGMA to adapt queries
  * (`/root/reference/query/search.py:542-556`). Parquet-native equivalents:
  *
  *  - ADDITIVE evolution is free: `mergeSchema` unions the footers of mixed-
  *    version files; old files yield null for new columns.
  *  - the PRAGMA-sniff becomes [[resolveOptional]]: project the canonical
  *    column set, substituting typed defaults for columns absent in this
  *    table's generation — so one query text runs against any KB vintage
  *    (the reference's optional `primary_category`/`categories` handling).
  */
object SchemaEvolution {

  /** The canonical optional columns added by later "migrations", with their
    * defaults — mirrors the reference's v1-v3 additive set.
    */
  val OptionalColumns: Seq[(String, DataType, Column)] = Seq(
    ("bm25_tokens", ArrayType(StringType), array().cast(ArrayType(StringType))),
    ("doc_length", IntegerType, lit(0)),
    ("primary_category", StringType, lit(null).cast(StringType)),
    ("categories", ArrayType(StringType), array().cast(ArrayType(StringType))),
    ("created_at", TimestampType, lit(null).cast(TimestampType)))

  /** Read a chunk table of ANY vintage: merge file schemas, then resolve
    * the canonical optional columns.
    */
  def readChunks(spark: SparkSession, path: String): DataFrame =
    resolveOptional(spark.read.option("mergeSchema", "true").parquet(path))

  /** Project optional columns to their canonical names/types, adding typed
    * defaults where a column is missing entirely and coalescing nulls from
    * pre-migration files where it exists only in newer files.
    */
  def resolveOptional(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    OptionalColumns.foldLeft(df) { case (d, (name, dt, default)) =>
      if (present.contains(name))
        d.withColumn(name, coalesce(col(name).cast(dt), default))
      else d.withColumn(name, default)
    }
  }
}
