package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring (SURVEY §4.2: no custom optimizer `Rule` or
  * `SparkStrategy` is required for this engine — every operator is
  * DataFrame-expressible — so the extension surface is native function
  * registration only).
  *
  * Use: `--conf spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `.withExtensions(new GraftExtensions)` on the session builder; the
  * scalar UDF surface (graft.functions.SeqFunctions) is registered
  * per-session separately because plain UDFs don't need extension wiring.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.hammingDescriptor)
  }
}

object GraftExtensions {

  private[plans] val hammingDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hamming_distance"),
    new ExpressionInfo(classOf[HammingDistance].getName, "hamming_distance"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "hamming_distance(a, b) takes two arguments")
      HammingDistance(children.head, children(1))
    })

  /** Register on an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = hammingDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
