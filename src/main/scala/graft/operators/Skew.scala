package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (builder-prompt scale checklist: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handles skewed SHUFFLE partitions automatically; salting
  * is still needed when one logical key is so hot that even a split
  * partition hammers a single aggregation state or when the skewed side
  * joins a non-broadcastable dimension. Both shapes here:
  *
  *  - '''Salted aggregation''': two-phase groupBy — first on
  *    (key, salt), then on key. Σ is reassociated, counts sum, so any
  *    algebraic aggregate composes.
  *  - '''Salted join''': explode the small side `saltBuckets`× with every
  *    salt value, salt the big side randomly-but-deterministically
  *    (hash-based, reproducible) — the hot key spreads over `saltBuckets`
  *    reducers.
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of the row's `saltBy` columns
    * — reproducible across retries (no rand() and no
    * monotonically_increasing_id(), both of which change under task retry /
    * nondeterministic upstream ordering and would double-count or drop rows
    * in the two-phase aggregation). Callers pass the FULL row content
    * (all value columns) so equal rows co-locate and distinct rows spread.
    */
  def salt(buckets: Int, saltBy: Column*): Column =
    pmod(hash(saltBy: _*), lit(buckets))

  /** Two-phase salted sum-aggregation: `agg` maps column name → ("sum" |
    * "count" | "max" | "min"). Result equals the direct groupBy for these
    * algebraic functions.
    */
  /** Columns safe to feed Spark's hash(): MapType is rejected by the
    * analyzer (SPARK-27619), so exclude it. Identical full rows necessarily
    * share a bucket under any DETERMINISTIC salt — acceptable: retry safety
    * is non-negotiable, and duplicate-heavy hot keys should be pre-combined
    * (map-side partial aggregation already collapses them).
    */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    val cs = df.schema.fields.filterNot(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toSeq
    if (cs.isEmpty) Seq(lit(0)) else cs
  }

  def saltedAgg(df: DataFrame, key: String, buckets: Int,
                aggs: Map[String, String]): DataFrame = {
    val p1Aggs = aggs.map { case (c, f) => expr(s"$f($c)").as(s"_p_$c") }.toSeq
    val phase1 = df
      .withColumn("_salt", salt(buckets, hashableCols(df): _*))
      .groupBy(col(key), col("_salt"))
      .agg(p1Aggs.head, p1Aggs.tail: _*)
    val phase2Aggs = aggs.map { case (c, f) =>
      val refold = f match {
        case "count" => "sum" // counts re-fold by summing
        case other   => other
      }
      expr(s"$refold(_p_$c)").as(s"${f}_$c")
    }.toSeq
    phase1.groupBy(col(key)).agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Salted equi-join: big ⋈ small on `key`, hot keys spread over
    * `buckets` reducers. The small side is replicated `buckets`× — use only
    * when the small side is too big to broadcast outright but buckets×small
    * still fits the shuffle comfortably.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      salt(buckets, hashableCols(big): _*))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(explodedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
