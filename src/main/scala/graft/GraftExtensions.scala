package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.FunctionRegistration

/** SparkSessionExtensions entry point: makes graft's native expressions
  * (`graft_dot`, `graft_shingle_hash`, `graft_token_window_hash`,
  * `graft_minhash_bands`, `graft_simhash`, `graft_sorted_intersect`,
  * `graft_srp_sketch`, `graft_deflate_len`) callable
  * from SQL in any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  * L2 norm composes as `sqrt(graft_dot(v, v))`.
  *
  * For an already-running session, use
  * `org.apache.spark.sql.graft.FunctionRegistration.registerGraftFunctions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    FunctionRegistration.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
