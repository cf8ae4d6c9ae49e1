package graft.plans

import graft.functions.{CosineSimilarity, DotProduct, L2Norm}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` installer — the deployment path for the engine
  * on an existing cluster without code changes:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  *
  * injects the vector kernels into every session's function registry at
  * build time (vs. [[graft.GraftSession.prepare]], which patches a live
  * session). No custom rules or strategies are injected: per SURVEY §7.3,
  * every graft operator plans optimally with stock Catalyst — the
  * expressions are the only genuinely custom planner surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "vec_norm"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2Norm(es.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_cos"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cos"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(es(0), es(1))))
  }
}
