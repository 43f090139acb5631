package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Temperature-weighted domain sampling: draw a target-size corpus whose
    * group mix follows `count^alpha` (the multilingual-pretraining mix rule —
    * alpha < 1 upweights rare domains/languages; alpha = 1 is proportional).
    * Per-group quota q_g = T · w_g / Σw with w_g = count_g^alpha; per-row keep
    * fraction min(1, q_g / count_g), decided by the same hash draw as every
    * sampler here (no rand() — reruns and retries draw identically). Unlike
    * [[hashSample]]/[[stratifiedSample]] this is NOT append-consistent:
    * the thresholds are computed from the corpus mix, so growing a group
    * re-weights every group — by design (the mix is the contract).
    *
    * Float determinism across engines: the only non-rational step, pow, is
    * micro-quantized to an integer weight (floor · 1e6) immediately, so the
    * group-sum Σw is exact integer math; everything after is one fixed tree
    * of correctly-rounded double ops on identical operands.
    *
    * 100 TB: one map-side-combined groupBy(group) produces the tiny counts
    * table (group-cardinality rows — languages/sources, not documents); the
    * thresholds broadcast back, and membership is a per-row projection with
    * no second shuffle.
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        targetRows: Long, alpha: Double = 0.5): DataFrame = {
    val ratio = groupRatios(df, groupCol, targetRows, alpha)
      .withColumn("thr",
        floor(least(lit(1.0), col("ratio")) * lit(P.toDouble)).cast("long"))
      .select(col(groupCol), col("thr"))
    df.join(broadcast(ratio), Seq(groupCol))
      .filter(hashDraw(col(idCol)) < col("thr"))
  }

  /** Temperature-weighted MIX with repetition: like [[temperatureSample]]
    * but a group whose quota EXCEEDS its size upsamples by repetition —
    * each row gets `n_repeats = floor(r_g)` plus one more when its hash
    * draw lands under the fractional part (so the group total ≈ quota with
    * deterministic draws). This is how pretraining mixes actually
    * materialize a rare domain at α < 1: epochs over the rare data, not
    * impossible fractions > 1. Rows with n_repeats = 0 are dropped.
    */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
                     targetRows: Long, alpha: Double = 0.5): DataFrame = {
    val thr = groupRatios(df, groupCol, targetRows, alpha)
      .withColumn("base", floor(col("ratio")).cast("long"))
      .withColumn("frac_thr",
        floor((col("ratio") - floor(col("ratio"))) * lit(P.toDouble)).cast("long"))
      .select(col(groupCol), col("base"), col("frac_thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .withColumn("n_repeats",
        (col("base") + when(hashDraw(col(idCol)) < col("frac_thr"), 1L)
          .otherwise(0L)).cast("long"))
      .filter(col("n_repeats") > 0)
      .drop("base", "frac_thr")
  }

  /** Second independent multiplier (xxHash's public PRIME32_2) for the
    * within-shard order draw: reusing [[Knuth]] would make a shard's order
    * a function of its membership residue.
    */
  val Knuth2 = 2246822519L

  /** Deterministic training-order sharding — the EXPORT step of a training
    * pipeline: every curated document gets a shard file and a position
    * inside it, and any engine (or any re-run after a failure) reproduces
    * the identical layout. shard = hash₁(id) mod n; within-shard order by
    * an INDEPENDENT hash₂(id) so the global read order is a reproducible
    * pseudo-random shuffle of the corpus (training loaders read shards
    * round-robin). Never rand(): a retried write task must land the same
    * rows at the same positions.
    *
    * 100 TB: one shuffle, keyed by the shard — exactly the clustering the
    * partitioned writer needs anyway (`write.partitionBy("shard")` after
    * `repartition(col("shard"))` gives one file per shard, rows already in
    * position order via sortWithinPartitions). The per-shard window sort
    * is the per-output-file sort every shard writer pays; nShards is the
    * parallelism knob.
    */
  def shardOrder(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val w = Window.partitionBy("shard")
      .orderBy(pmod(col(idCol) * Knuth2, lit(P)), col(idCol))
    df.withColumn("shard", pmod(hashDraw(col(idCol)), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Per-group keep ratio r_g = quota_g / count_g with quota_g = T·w_g/Σw,
    * w_g = count_g^alpha. pow() is micro-quantized into an integer weight
    * immediately so Σw is exact; the ratio is one fixed tree of
    * correctly-rounded double ops — bit-identical in any engine.
    */
  private def groupRatios(df: DataFrame, groupCol: String, targetRows: Long,
                          alpha: Double): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .withColumn("w",
        floor(pow(col("n").cast("double"), lit(alpha)) * lit(1e6)).cast("long"))
    val total = counts.agg(sum("w").as("tw"))
    counts.crossJoin(broadcast(total))
      .withColumn("ratio",
        ((lit(targetRows.toDouble) * col("w").cast("double"))
          / col("tw").cast("double")) / col("n").cast("double"))
  }
}
