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
  * Determinism contract: the right side must be unique per (key, ts) —
  * pre-aggregate it (e.g. max per timestamp) if it is not; otherwise which
  * same-timestamp row wins is partition-order-dependent.
  */
object AsofJoin {

  /** @param left      rows to annotate (keeps ALL its columns)
    * @param right     lookup side: must contain `keyCol`, `tsCol`, and
    *                  `valueCols`; unique per (key, ts)
    * @param valueCols right columns carried onto each left row, null when no
    *                  right row is at-or-before the left timestamp
    */
  def asofLast(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               valueCols: Seq[String]): DataFrame = {
    val markers = valueCols.map(c => s"_asof_$c")
    val lTyped = valueCols.zip(markers).foldLeft(left.withColumn("_side", lit(1))) {
      case (df, (c, m)) => df.withColumn(m, lit(null).cast(right.schema(c).dataType))
    }
    val r = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_side")) ++
        valueCols.zip(markers).map { case (c, m) => col(c).as(m) }: _*)
    val unioned = lTyped.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = markers.foldLeft(unioned) { (df, m) =>
      df.withColumn(m, last(col(m), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .drop("_side")
      .withColumnsRenamed(markers.zip(valueCols).map { case (m, c) => m -> s"asof_$c" }.toMap)
  }
}
