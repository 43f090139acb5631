package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation and (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Column names/order MUST match between the two — the driver's
  * comparator sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Cut a plan tree at a SMALL intermediate (guide §3.3 "materialising an
    * intermediate truncates the plan"): lazy localCheckpoint — the subtree
    * executes ONCE on the first consuming action instead of once per
    * downstream reference — followed by a re-alias of every column so the
    * checkpointed LogicalRDD's retained exprIds can never collide with a
    * fresh scan of a relation the subtree also read (the
    * relation-vs-checkpoint analysis failure Rm3 documents).
    *
    * Use ONLY on k-bounded/vocab-bounded intermediates that the downstream
    * plan references more than once — eval rankings, qrels, head slices —
    * where the alternative is a multiplicatively duplicated plan (the m15
    * family's static plan carried 420-724 Exchange nodes before this).
    * Values are unchanged: checkpointing only pins the subtree's result.
    */
  def cutPlan(df: DataFrame): DataFrame = {
    val cut = df.localCheckpoint(false)
    cut.select(cut.columns.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*)
  }
}
