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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", classOf[CosineF32]),
      (args: Seq[Expression]) => CosineF32(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", classOf[DotF32]),
      (args: Seq[Expression]) => DotF32(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_polyhash"),
      info("graft_polyhash", classOf[PolyHashExpr]),
      (args: Seq[Expression]) => PolyHashExpr(args.head, 31L)))
    ext.injectFunction((FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", classOf[SimHash60Expr]),
      (args: Seq[Expression]) => SimHash60Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", classOf[MinHashSigExpr]),
      (args: Seq[Expression]) => {
        def intArg(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig $what must be an integer literal, got $other")
        }
        MinHashSigExpr(args.head,
          if (args.length > 1) intArg(args(1), "shingleN") else 3,
          if (args.length > 2) intArg(args(2), "numHashes") else 16)
      }))
  }
}
