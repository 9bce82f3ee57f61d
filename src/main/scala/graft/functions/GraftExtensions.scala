package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector — registers the native vector kernels as
  * permanent SQL functions at session build time:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // programmatic
  * // or spark.sql.extensions=graft.functions.GraftExtensions (config-driven)
  * }}}
  *
  * Unlike `VectorFunctions.register` (temp functions on a live session),
  * injection survives session cloning and applies to every session built
  * from the config — the right mechanism for cluster-wide deployment.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "_FUNC_(a, b) - cosine similarity of two array<double> vectors"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_squared"),
      info("l2_squared",
        "_FUNC_(a, b) - squared L2 distance of two array<double> vectors"),
      (exprs: Seq[Expression]) => L2Squared(exprs(0), exprs(1))))
  }
}
