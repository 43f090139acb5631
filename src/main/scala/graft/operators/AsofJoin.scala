package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single latest right
  * row with `r.ts <= l.ts` in the same key group (builder-prompt extension:
  * the time-series join Spark lacks as a built-in operator).
  *
  * Implementation is the union-sort-fill form, NOT a range join: tag both
  * sides, union, ONE shuffle on the key, sort each group by (ts, side) and
  * forward-fill the right-side values with `last(_, ignoreNulls)` over a
  * running window, then keep left rows. Cost is one shuffle of |L|+|R| rows
  * regardless of time overlap — a naive `l.ts >= r.ts` range join
  * materializes O(|L|·|R|) candidate pairs per key and dies at 100 TB; a
  * broadcast range join caps the right side. Equal timestamps: the right
  * row sorts BEFORE the left row (side 0 < 1), so `r.ts == l.ts` matches.
  *
  * The fill carries ONE STRUCT of all value columns, not per-column fills:
  * per-column `last(ignoreNulls)` would skip a NULL field and backfill it
  * from an OLDER right row, blending fields of different rows — true as-of
  * semantics (and SQL ASOF JOIN) take every field from the single latest
  * row, nulls included.
  *
  * Determinism contract: the right side must be unique per (key, ts) —
  * pre-aggregate it (e.g. max per timestamp) if it is not; otherwise which
  * same-timestamp row wins is partition-order-dependent.
  */
object AsofJoin {

  /** @param left      rows to annotate (keeps ALL its columns)
    * @param right     lookup side: must contain `keyCol`, `tsCol`, and
    *                  `valueCols`; unique per (key, ts)
    * @param valueCols right columns carried onto each left row as
    *                  `asof_<name>`, all NULL when no right row is
    *                  at-or-before the left timestamp
    */
  def asofLast(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               valueCols: Seq[String]): DataFrame = {
    val reserved = Seq("_side", "_asof_row")
    require(!reserved.exists(left.columns.contains),
      s"left must not contain reserved columns ${reserved.mkString(", ")}")
    require(!reserved.exists(right.columns.contains),
      s"right must not contain reserved columns ${reserved.mkString(", ")}")
    val collisions = valueCols.map(c => s"asof_$c").filter(left.columns.contains)
    require(collisions.isEmpty,
      s"output columns ${collisions.mkString(", ")} already exist on the left side")
    val l = left.withColumn("_side", lit(1))
    val r = right.select(col(keyCol), col(tsCol), lit(0).as("_side"),
      struct(valueCols.map(col): _*).as("_asof_row"))
    // unionByName(allowMissingColumns) adds _asof_row to the left side as a
    // typed NULL — exactly the marker the fill needs
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("_asof_row", last(col("_asof_row"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
    valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"_asof_row.$c"))
    }.drop("_asof_row")
  }
}
