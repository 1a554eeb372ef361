package graft

import graft.functions.{VecDot, Winnow}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: makes the engine's native
  * Catalyst expressions and optimizer rules available to ANY session
  * (including pure-SQL users) via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  *   SELECT vec_dot(a, b)            -- codegen'd float/double dot product
  *   SELECT winnow(text, 8, 4)       -- Rabin-Karp winnowing fingerprints
  *
  * plus graft.plans.DeriveBucketFilter, which turns plain `t` range
  * predicates over the partitioned ts layout into partition-pruning
  * p_bucket predicates automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
          VecDot(exprs.head, exprs(1))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("winnow"),
        new ExpressionInfo(classOf[Winnow].getName, "winnow"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 3, "winnow(text, k, win) takes exactly 3 arguments")
          Winnow(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "win"))
        }
      )
    )
    ext.injectOptimizerRule(_ => graft.plans.DeriveBucketFilter())
  }
}
