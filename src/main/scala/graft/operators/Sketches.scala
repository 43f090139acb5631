package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.Searching._

/** Distinct-count sketching (builder-prompt extension: the approximate
  * aggregations a 100 TB training-data pipeline needs — cardinality audits
  * per source/shard without a full `count(DISTINCT)` shuffle).
  *
  * The sketch here is KMV (k-minimum-values, Bar-Yossef et al. 2002): keep
  * the k smallest DISTINCT hash values of the input; if fewer than k exist
  * the count is exact, otherwise N̂ = (k−1) · M / h₍ₖ₎ where M is the hash
  * modulus and h₍ₖ₎ the k-th smallest kept hash. Chosen over HLL for the
  * oracle story: KMV is fully DETERMINISTIC given the hash function — the
  * shared polyHash (mult 31, mod 1e9+7) makes the DuckDB oracle reproduce
  * the estimate bit-for-bit, so the driver hash-compare verifies an
  * APPROXIMATE operator exactly. Standard error is ~1/√(k−2) (~12.7% at
  * k=64), asserted in SketchesSpec.
  *
  * Scale shape: the buffer is bounded at k longs; Spark runs the Aggregator
  * as a partial aggregate with map-side combine, so each partition
  * contributes at most k values to the shuffle regardless of row count —
  * `count(DISTINCT x)` by contrast shuffles every distinct value. Merge is
  * a sorted-distinct merge (commutative, associative, idempotent per
  * value), so the result is identical for ANY partitioning — unlike naive
  * sampling, a KMV union is itself the KMV of the union.
  */
final case class KmvSummary(n_kept: Int, kth_hash: Long)
final case class KmvBuf(hs: Vector[Long])

class KmvAggregator(k: Int) extends Aggregator[Long, KmvBuf, KmvSummary] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  private def insert(b: KmvBuf, h: Long): KmvBuf =
    if (b.hs.length >= k && h >= b.hs.last) b // bounded: fast reject
    else b.hs.search(h) match {
      case Found(_) => b // already kept: distinctness is structural
      case InsertionPoint(i) =>
        KmvBuf(((b.hs.take(i) :+ h) ++ b.hs.drop(i)).take(k))
    }

  override def zero: KmvBuf = KmvBuf(Vector.empty)
  override def reduce(b: KmvBuf, h: Long): KmvBuf = insert(b, h)
  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = y.hs.foldLeft(x)(insert)
  override def finish(b: KmvBuf): KmvSummary =
    KmvSummary(b.hs.length, if (b.hs.isEmpty) 0L else b.hs.last)
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvSummary] = Encoders.product[KmvSummary]
}

object Sketches {

  /** polyHash modulus — the hash space KMV normalizes over. */
  val HashModulus: Double = 1000000007.0

  /** The uniform hash KMV requires: polyHash of the sha256 HEX DIGEST.
    * Bare polyHash of short keys is far from uniform (a 6-char key never
    * wraps the modulus, so small keys pile up near 0 and the estimator
    * collapses); 64 hex chars of sha256 wrap it ~40 times → uniform on
    * [0, 1e9+7). Both engines share sha256 (lowercase hex) and polyHash, so
    * the oracle reproduces the value exactly.
    */
  def uniformHash(c: Column): Column =
    graft.functions.TextFunctions.polyHash(sha2(c, 256))

  /** Column agg: `kmv(k)(hashCol)` → struct(n_kept, kth_hash). `hashCol`
    * must be the shared polyHash (values in [0, 1e9+7)).
    */
  def kmv(k: Int): Column => Column = { h =>
    udaf(new KmvAggregator(k), Encoders.scalaLong)(h)
  }

  /** The estimator over a kmv summary struct: exact below k, else
    * (k−1)·M/h₍ₖ₎ rounded to 4 dp (same rounding as the oracle SQL).
    */
  def estimate(summary: Column, k: Int): Column =
    when(summary.getField("n_kept") < k,
      summary.getField("n_kept").cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble * HashModulus) /
          summary.getField("kth_hash").cast("double"), 4))
}
