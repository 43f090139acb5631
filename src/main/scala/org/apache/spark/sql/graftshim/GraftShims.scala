package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from Catalyst [[Expression]]s to the public [[Column]] API.
  *
  * Spark 4 made `Column` expression-free (ColumnNode-backed); lifting a raw
  * Catalyst expression requires `classic.ExpressionUtils`, which is
  * `private[sql]` — hence this one-object shim living under
  * `org.apache.spark.sql`. No Spark internals are modified.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an ALREADY-BUILT session (sessionState is
    * `private[sql]`): lets Verify/Bench/test sessions reach the graft SQL
    * surface without rebuilding with `withExtensions`.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
