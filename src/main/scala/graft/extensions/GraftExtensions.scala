package graft.extensions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.HammingDistance

/** Session extension point: registers graft's native expressions so they
  * are usable from SQL text as well as the Column API. Install with
  * `.config("spark.sql.extensions", "graft.extensions.GraftExtensions")`
  * or call [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.hammingDescriptor)
}

object GraftExtensions {
  private val hammingDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hamming_distance"),
    new ExpressionInfo(classOf[HammingDistance].getName, "hamming_distance"),
    (children: Seq[Expression]) => HammingDistance(children(0), children(1)))

  /** Runtime registration for sessions built without the extensions conf. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = hammingDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
