package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.DotProductExpr

/** SparkSessionExtensions entry point: makes graft's native expressions
  * callable from SQL in any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * For an already-running session, use
  * `org.apache.spark.sql.graft.FunctionRegistration.registerGraftFunctions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot requires exactly 2 arguments, got ${children.length}")
        DotProductExpr(children.head, children(1))
      }))
  }
}
