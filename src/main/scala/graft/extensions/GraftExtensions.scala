package graft.extensions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, HammingDistance}

/** Session extension point: registers graft's native expressions so they
  * are usable from SQL text as well as the Column API. Install with
  * `.config("spark.sql.extensions", "graft.extensions.GraftExtensions")`
  * or call [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def binary(name: String, clazz: Class[_],
      build: (Expression, Expression) => Expression): Descriptor =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"$name takes exactly 2 arguments, got ${children.length}")
        build(children(0), children(1))
      })

  private val descriptors: Seq[Descriptor] = Seq(
    binary("hamming_distance", classOf[HammingDistance], HammingDistance(_, _)),
    binary("dot_product", classOf[DotProduct], DotProduct(_, _)))

  /** Runtime registration for sessions built without the extensions conf. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
