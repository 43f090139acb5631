package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    val rnd = new scala.util.Random(11)
    (0 until 200).map(i =>
      (i.toLong, Array.fill(32)((rnd.nextGaussian()).toFloat)))
      .toDF("id", "v")
  }

  test("quantizeI8 bounds values to [-127, 127] and zeros stay zeros") {
    val q = vecs.select(VectorFunctions.quantizeI8(col("v")).as("q"))
      .select(explode(col("q")).as("x"))
      .agg(min("x"), max("x")).collect()(0)
    assert(q.getByte(0) >= -127 && q.getByte(1) <= 127)
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("id", "v")
      .select(VectorFunctions.quantizeI8(col("v")).as("q"))
      .collect()(0).getSeq[Byte](0)
    assert(z.forall(_ == 0))
  }

  test("codegen quantizeI8/cosineI8 match the HOF spec twins exactly") {
    // random gaussians plus adversarial rows: all-zero, single-element,
    // negative-heavy, and values whose scaled form lands near ±x.5
    val edge = Seq(
      (1000L, Array(0f, 0f, 0f, 0f)),
      (1001L, Array(1f)),
      (1002L, Array(-1f, -0.5f, 0.5f, 0.25f)),
      (1003L, Array(2f, 1f, -1f, 0.0039370078f)), // 0.0039.. * 127/2 ≈ 0.25
      (1004L, Array(254f, 1f, -1f, 3f))           // 1*127/254 = 0.5 exactly
    ).toDF("id", "v")
    val all = vecs.union(edge)
    val mismatch = all.select(col("id"),
        VectorFunctions.quantizeI8(col("v")).as("fast"),
        VectorFunctions.quantizeI8Spec(col("v")).as("spec"))
      .filter(not(col("fast") === col("spec")))
    assert(mismatch.count() === 0)
    val q = all.select(col("id"), VectorFunctions.quantizeI8(col("v")).as("q"))
    val qv = q.filter(col("id") === 1004L).collect()(0).getSeq[Byte](1)
    val qLit = array(qv.map(b => lit(b)): _*)
    val sq = Seq((1L, qv.toArray)).toDF("qid", "qv")
    val cosMismatch = q.filter(size(col("q")) === qv.size).crossJoin(sq)
      .select(col("id"),
        VectorFunctions.cosineI8(col("q"), qLit).as("fast"),
        VectorFunctions.cosineI8Spec(col("q"), qLit).as("spec"))
      .filter(not(col("fast") === col("spec")))
    assert(cosMismatch.count() === 0)
  }

  test("int8 cosine recall@20 vs exact float cosine is high") {
    val quant = vecs.select(col("id"), col("v"),
      VectorFunctions.quantizeI8(col("v")).as("q"))
    val qrow = quant.filter(col("id") === 0).collect()(0)
    val fv = qrow.getSeq[Float](1)
    val qv = qrow.getSeq[Byte](2)
    val exact = quant.select(col("id"),
        VectorFunctions.cosine(col("v"), VectorFunctions.vecLit(fv)).as("s"))
      .orderBy(col("s").desc, col("id")).limit(20)
      .collect().map(_.getLong(0)).toSet
    val viaI8 = quant.select(col("id"),
        VectorFunctions.cosineI8(col("q"), array(qv.map(b => lit(b)): _*)).as("s"))
      .orderBy(col("s").desc, col("id")).limit(20)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(viaI8).size.toDouble / 20.0
    assert(recall >= 0.8, s"int8 recall@20 too low: $recall")
  }
}
