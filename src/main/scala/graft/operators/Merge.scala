package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-style upsert merge without a table format: `changes` override
  * `base` rows on the key, new keys append — MERGE INTO's matched/
  * not-matched semantics as ONE shuffled window over the union (the
  * standard Spark pattern when Delta/Iceberg is not available; with a
  * lakehouse format the same call becomes `MERGE INTO`, and at rest the
  * table would be bucketed by the key so the shuffle is co-located).
  *
  * Contract: `changes` is unique per key (dedupe a CDC stream with
  * [[graft.streaming.StreamingIngest.dedupStream]] first); schemas match.
  */
object Merge {
  def upsert(base: DataFrame, changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(base.columns.sorted.sameElements(changes.columns.sorted),
      "base and changes must share a schema")
    require(!base.columns.contains("_pri") && !base.columns.contains("_rn"),
      "reserved columns _pri/_rn present")
    val b = base.withColumn("_pri", lit(0))
    val c = changes.withColumn("_pri", lit(1))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_pri").desc)
    b.unionByName(c)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_pri")
  }
}
