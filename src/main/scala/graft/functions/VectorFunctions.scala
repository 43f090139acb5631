package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns (SURVEY §2.9, T1).
  *
  * The reference delegates all of this to FAISS
  * (`/root/reference/query/search.py:242`, inner-product / L2 metrics at
  * `query/search.py:245-258`). Spark-side we keep vectors as plain
  * `ARRAY<FLOAT>` columns and express dot/cosine with the higher-order
  * `zip_with`/`aggregate` functions, which evaluate inside codegen without
  * UDF boxing. Accumulation is in double, sequentially over the array —
  * deterministic for a given row regardless of partitioning.
  */
object VectorFunctions {

  /** Dot product of two float-array columns — codegen'd [[DotF32]]; the
    * higher-order-function spec equivalent is [[dotSpec]] (identical math,
    * interpreted — kept as the executable specification for tests).
    */
  def dot(a: Column, b: Column): Column = FastFunctions.dot(a, b)

  /** Spec version of [[dot]]: sequential double accumulation via HOFs. */
  def dotSpec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 when either vector is all-zero (FAISS IP on
    * unnormalized zero vectors returns 0 — `query/search.py:245-258` treats
    * score passthrough; we pick the conventional 0).
    */
  def cosine(a: Column, b: Column): Column = FastFunctions.cosine(a, b)

  /** Spec version of [[cosine]] — same float→double→sqrt order as
    * [[HashAlgos.cosineF32]], interpreted HOFs.
    */
  def cosineSpec(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dotSpec(a, b) / denom).otherwise(lit(0.0))
  }

  /** Squared Euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** F10 L2→similarity transform `1/(1+d)`
    * (`/root/reference/query/search.py:245-258`). */
  def l2ToSimilarity(dist: Column): Column = lit(1.0) / (lit(1.0) + dist)

  /** F11 rerank score→distance
    * (`/root/reference/embedding/rerank_manager.py:321-328`): the inverse of
    * [[l2ToSimilarity]] with an epsilon guard, `1/(score+1e-6) − 1`, used to
    * re-enter "lower is better" space when mixing reranked hits back into
    * distance-sorted lists.
    */
  def scoreToDistance(score: Column): Column =
    lit(1.0) / (score + lit(1e-6)) - lit(1.0)

  /** A literal query vector as a Column (broadcast as a constant into
    * codegen — no join needed for single-query scoring).
    */
  def vecLit(v: Seq[Float]): Column = array(v.map(x => lit(x)): _*)

  /** Symmetric int8 quantization: q_j = round(v_j · 127 / max|v|), the
    * classic 4×-storage scalar quantization for embedding columns (FAISS
    * SQ8 / IVFPQ territory re-expressed as a column transform). Cosine over
    * quantized vectors needs NO dequantization — the per-vector scale
    * cancels in dot/(|a||b|) — so [[cosineI8]] serves similarity search
    * straight off the small column with pure integer dot products.
    * All-zero vectors quantize to zeros.
    */
  def quantizeI8(v: Column): Column = FastFunctions.quantizeI8(v)

  /** Spec version of [[quantizeI8]]: the same round-half-away math as
    * interpreted HOFs (QuantizeSpec asserts fast == spec).
    */
  def quantizeI8Spec(v: Column): Column = {
    val mx = array_max(transform(v, x => abs(x.cast("double"))))
    transform(v, x =>
      when(mx > 0, round(x.cast("double") * 127.0 / mx).cast("tinyint"))
        .otherwise(lit(0).cast("tinyint")))
  }

  /** Integer dot product of two int8-quantized vectors (exact 64-bit). */
  def dotI8(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Cosine over int8-quantized vectors: integer dot and norms, one double
    * division at the end — scale-free and exactly reproducible by any SQL
    * engine (integer math everywhere).
    */
  def cosineI8(a: Column, b: Column): Column = FastFunctions.cosineI8(a, b)

  /** Spec version of [[cosineI8]] — interpreted HOFs, same integer math. */
  def cosineI8Spec(a: Column, b: Column): Column = {
    def nsq(c: Column): Column =
      aggregate(c, lit(0L), (acc, x) => acc + x.cast("long") * x.cast("long"))
    val denom = sqrt(nsq(a).cast("double")) * sqrt(nsq(b).cast("double"))
    when(denom > 0, dotI8(a, b).cast("double") / denom).otherwise(lit(0.0))
  }

  /** Per-token 60-bit hashes for SimHash: array of h1 + h2*2^30 where h1/h2
    * are the two polynomial hash families. Materialize this ONCE per row
    * (e.g. `.withColumn("th", tokenHashes60($"tokens"))`) and feed the column
    * to [[simhashFromHashes]] — the signature reads the array 60 times, so
    * recomputing the hashes inline would be O(60·|tokens|·|chars|).
    */
  def tokenHashes60(tokens: Column): Column =
    transform(tokens, t =>
      TextFunctions.polyHash(t) + TextFunctions.polyHash2(t) * lit(1073741824L)) // h1 + h2 << 30

  /** SimHash signature (60-bit LONG) from precomputed token hashes: for each
    * bit position, sum ±1 over tokens by that bit of the token hash; signature
    * bit = 1 iff the sum is positive. Integer math only →
    * oracle-reproducible (SURVEY extension: SimHash near-dup detection).
    */
  def simhashFromHashes(tokenHashes: Column): Column = {
    val bits = (0 until 60).map { b =>
      val contrib = aggregate(tokenHashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(contrib > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two 60-bit signatures. */
  def hamming60(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
