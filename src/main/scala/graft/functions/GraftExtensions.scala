package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the graft codegen expressions as
  * SQL functions, so `spark.sql("SELECT graft_cosine(a, b) ...")` works the
  * same as the Column API — the full engine surface is reachable from pure
  * SQL sessions (JDBC/thrift users included).
  *
  * Install via `spark.sql.extensions=graft.functions.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions())`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, name)

  private val classes: Map[String, Class[_]] = Map(
    "graft_cosine" -> classOf[CosineF32], "graft_dot" -> classOf[DotF32],
    "graft_polyhash" -> classOf[PolyHashExpr],
    "graft_simhash60" -> classOf[SimHash60Expr],
    "graft_minhash_sig" -> classOf[MinHashSigExpr],
    "graft_char_ngrams" -> classOf[CharNgramHashesExpr],
    "graft_word_shingles" -> classOf[WordShinglesExpr],
    "graft_tokenize" -> classOf[TokenizeExpr],
    "graft_tokenize_bm25" -> classOf[TokenizeExpr],
    "graft_word_repetition" -> classOf[WordRepetitionExpr],
    "graft_dsir_buckets" -> classOf[DsirBucketsExpr])

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        info(name, classes(name)), builder))
    }
}

object GraftExtensions {

  /** The function builders, shared between the extensions hook and
    * [[install]].
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> ((args: Seq[Expression]) => CosineF32(args(0), args(1))),
    "graft_dot" -> ((args: Seq[Expression]) => DotF32(args(0), args(1))),
    "graft_polyhash" -> ((args: Seq[Expression]) => PolyHashExpr(args.head, 31L)),
    "graft_simhash60" -> ((args: Seq[Expression]) => SimHash60Expr(args.head)),
    "graft_minhash_sig" -> ((args: Seq[Expression]) => {
      def intArg(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_minhash_sig $what must be an integer literal, got $other")
      }
      MinHashSigExpr(args.head,
        if (args.length > 1) intArg(args(1), "shingleN") else 3,
        if (args.length > 2) intArg(args(2), "numHashes") else 16)
    }),
    "graft_char_ngrams" -> ((args: Seq[Expression]) =>
      CharNgramHashesExpr(args.head, literalInt(args, 1, 3, "graft_char_ngrams n"))),
    "graft_word_shingles" -> ((args: Seq[Expression]) =>
      WordShinglesExpr(args.head, literalInt(args, 1, 3, "graft_word_shingles n"))),
    "graft_tokenize" -> ((args: Seq[Expression]) =>
      TokenizeExpr(args.head, bm25 = false)),
    "graft_tokenize_bm25" -> ((args: Seq[Expression]) =>
      TokenizeExpr(args.head, bm25 = true)),
    "graft_word_repetition" -> ((args: Seq[Expression]) =>
      WordRepetitionExpr(args.head,
        literalInt(args, 1, 3, "graft_word_repetition n"))),
    // dsir_score's log-ratio is a driver artifact (not literal-expressible);
    // the bucket walk IS, and SQL users compose counts/ratios relationally
    "graft_dsir_buckets" -> ((args: Seq[Expression]) =>
      DsirBucketsExpr(args.head,
        literalInt(args, 1, 1024, "graft_dsir_buckets buckets"))))

  private def literalInt(args: Seq[Expression], idx: Int, default: Int,
                         what: String): Int =
    if (args.length <= idx) default
    else args(idx) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

  /** Register the graft SQL functions on an already-built session — the
    * path for sessions not constructed with `withExtensions` (Verify,
    * Bench, notebooks attaching to a shared session).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.graftshim.GraftShims.registerFunction(spark, name, b)
    }
}
