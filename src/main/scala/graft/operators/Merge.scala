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

  /** [[upsert]] with F16 audit-timestamp maintenance — the reference's
    * created_at/updated_at columns plus its AFTER UPDATE trigger
    * (`/root/reference/database/migrations.py:253-283`) re-expressed over
    * caller-supplied INTEGER time (deterministic; wall-clock
    * `current_timestamp` is the trivial substitution): `base` carries
    * `created_at`/`updated_at`; every matched change keeps the row's
    * `created_at` and stamps `updated_at = changeTime` (the trigger fires
    * per UPDATE statement, content-equal or not); every unmatched change
    * inserts with `created_at = updated_at = changeTime`. Same
    * one-shuffled-window plan as [[upsert]], and the same contract:
    * `changes` must be unique per key — with duplicate change keys the
    * ranking window's `_pri` tie leaves WHICH change row survives
    * arbitrary (dedupe the CDC stream first, exactly as [[upsert]]'s
    * object-level contract states).
    */
  def upsertAudited(base: DataFrame, changes: DataFrame,
                    keyCols: Seq[String], changeTime: Long): DataFrame = {
    require(base.columns.contains("created_at") &&
      base.columns.contains("updated_at"),
      "base must carry created_at/updated_at")
    require(!changes.columns.contains("created_at") &&
      !changes.columns.contains("updated_at"),
      "changes carry no audit columns — the merge maintains them")
    val stamped = changes
      .withColumn("created_at", lit(changeTime).cast("long"))
      .withColumn("updated_at", lit(changeTime).cast("long"))
    require(base.columns.sorted.sameElements(stamped.columns.sorted),
      "base and changes must share a schema (minus the audit columns)")
    // matched rows: the change wins every column EXCEPT created_at, which
    // is the partition MINIMUM over base+change (the original insert time
    // — sticky across any number of updates); updated_at is the partition
    // MAXIMUM. Both computed BEFORE the keep-one filter, same partition
    // key as the ranking window — one shuffle total.
    val w = Window.partitionBy(keyCols.map(col): _*)
    val wOrd = w.orderBy(col("_pri").desc)
    base.withColumn("_pri", lit(0))
      .unionByName(stamped.withColumn("_pri", lit(1)))
      .withColumn("_created", min(col("created_at")).over(w))
      .withColumn("_updated", max(col("updated_at")).over(w))
      .withColumn("_rn", row_number().over(wOrd))
      .filter(col("_rn") === 1)
      .withColumn("created_at", col("_created"))
      .withColumn("updated_at", col("_updated"))
      .drop("_rn", "_pri", "_created", "_updated")
  }

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
