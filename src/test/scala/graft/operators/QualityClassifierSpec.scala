package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multinomial NB classifier ([[QualityClassifier]]): Laplace-smoothed
  * evidence wins on separable data, priors decide evidence-free docs,
  * ties break by label text, and the integer-quantized scores make every
  * assertion exact (no float tolerance anywhere).
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "spark shuffle partition executor", "eng"),
    (2L, "spark executor stage task", "eng"),
    (3L, "executor shuffle codegen stage", "eng"),
    (4L, "recipe flour sugar butter", "food"),
    (5L, "sugar butter oven recipe", "food"))
    .toDF("doc_id", "text", "label")

  test("evidence-supported label wins on held-out docs") {
    val model = QualityClassifier.train(train, "doc_id", "text", "label")
    val got = QualityClassifier.classify(model,
        Seq((10L, "shuffle executor task"), (11L, "butter sugar flour"))
          .toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "label").as[(Long, String)].collect().toMap
    assert(got(10L) == "eng" && got(11L) == "food", got.toString)
  }

  test("null/tokenless docs classify by prior; majority label wins") {
    val model = QualityClassifier.train(train, "doc_id", "text", "label")
    val got = QualityClassifier.classify(model,
        Seq((20L, null.asInstanceOf[String]), (21L, "   ")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id", "label").as[(Long, String)].collect().toMap
    // eng has 3 of 5 training docs → larger (less negative) prior
    assert(got(20L) == "eng" && got(21L) == "eng", got.toString)
  }

  test("exact score ties break by lexically smallest label") {
    // identical corpora under two labels: every score ties exactly because
    // the quantized integer math is identical per label
    val sym = Seq((1L, "alpha beta", "b"), (2L, "alpha beta", "a"))
      .toDF("doc_id", "text", "label")
    val model = QualityClassifier.train(sym, "doc_id", "text", "label")
    val got = QualityClassifier.classify(model,
        Seq((30L, "alpha")).toDF("doc_id", "text"), "doc_id", "text")
      .select("label").as[String].collect()
    assert(got.toSeq == Seq("a"), got.toSeq.toString)
  }

  test("trainAndClassify splits by id hash and reports the actual label") {
    val docs = (1L to 60L).map { i =>
      (i, if (i % 2 == 0) "spark executor shuffle" else "flour sugar recipe",
        if (i % 2 == 0) "eng" else "food")
    }.toDF("doc_id", "text", "label")
    val out = QualityClassifier.trainAndClassify(docs, "doc_id", "text", "label")
      .select("doc_id", "label", "actual").as[(Long, String, String)].collect()
    assert(out.nonEmpty && out.length < 60) // a genuine held-out split
    // perfectly separable vocabulary → perfect held-out accuracy
    assert(out.forall { case (_, pred, actual) => pred == actual },
      out.filter { case (_, p, a) => p != a }.mkString(", "))
  }
}
