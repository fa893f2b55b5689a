package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.{CosineSimilarity, DotProduct, L2SqDistance}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works alongside the
  * Column API (SURVEY.md §2.11 extension policy).
  *
  * Two deployment forms:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (cluster
  *    submit — applied at session build)
  *  - programmatic: `GraftExtensions.register(spark)` on a live
  *    session (tests, notebooks)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def binary(name: String, usage: String, f: (Expression, Expression) => Expression)
      : (String, ExpressionInfo, Builder) =
    (name,
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name expects exactly 2 arguments")
        f(children(0), children(1))
      })

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    binary("graft_l2sq", "squared L2 distance between two double arrays", L2SqDistance),
    binary("graft_dot", "dot product of two double arrays", DotProduct),
    binary("graft_cosine", "cosine similarity of two double arrays (0.0 on zero vectors)",
      CosineSimilarity))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
