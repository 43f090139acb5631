package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (builder-prompt
  * extension; the reference's only sampling is `ORDER BY RANDOM() LIMIT n`,
  * `/root/reference/categorize/categorize_manager.py:122-143`).
  *
  * All samplers key on an integer Knuth multiplicative hash of a stable id —
  * NEVER `rand()`: task retries and upstream reordering change `rand()`
  * draws mid-job, silently duplicating or dropping rows; a hash draw is a
  * pure projection, reproducible by any engine (DuckDB-oracle-checkable) and
  * stable under reruns — which also makes samples APPEND-CONSISTENT: new
  * corpus rows never flip the membership of old rows.
  */
object Sampling {
  val P = 1000000007L
  val Knuth = 2654435761L

  /** Hash draw in [0, P) for an integer id column. */
  def hashDraw(id: Column): Column = pmod(id * Knuth, lit(P))

  /** Keep ~`fraction` of rows, decided per-row by hash threshold —
    * embarrassingly parallel, no shuffle, no global count needed.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashDraw(col(idCol)) < lit((fraction * P).toLong))

  /** Stratified sampling: a different fraction per stratum value (cap a
    * dominant class, keep all of a rare one — the class-rebalance op).
    * Strata absent from `fractions` fall back to `defaultFraction`.
    * Same per-row hash decision: no shuffle, append-consistent.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit((defaultFraction * P).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit((f * P).toLong)).otherwise(acc)
    }
    df.filter(hashDraw(col(idCol)) < threshold)
  }
}
