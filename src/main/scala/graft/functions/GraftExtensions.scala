package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.expr

/** Session extension registering graft's native Catalyst functions.
  *
  * Two ways in, both public API:
  *  - `--conf spark.sql.extensions=graft.functions.GraftExtensions` on
  *    spark-submit (the cluster path), or
  *  - `SparkSession.builder.withExtensions(new GraftExtensions)` (the
  *    in-process path used by Verify/Bench/tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_f2h"),
      new ExpressionInfo(classOf[F2HExpression].getName, "graft_f2h"),
      (children: Seq[Expression]) => F2HExpression(children.head)
    ))
  }
}

object GraftFunctions {
  /** Apply graft_f2h via the SQL surface (requires GraftExtensions). */
  def f2hExpr(sqlFragment: String): Column = expr(s"graft_f2h($sqlFragment)")

  def builderWithExtensions(b: SparkSession.Builder): SparkSession.Builder =
    b.withExtensions(new GraftExtensions)
}
