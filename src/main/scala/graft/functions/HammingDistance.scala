package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: Hamming distance between two 64-bit
  * fingerprints (`bitCount(a ^ b)`).
  *
  * This is the one place the built-in function surface genuinely lacks a
  * primitive the SimHash near-dup path wants in its hot loop, so it is a
  * proper `BinaryExpression` with `doGenCode` — the comparison stays
  * inside whole-stage codegen (a Scala UDF here would box both longs and
  * break the codegen span across the candidate join's verify filter).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Column wrapper for DataFrame use. */
  def hamming(a: Column, b: Column): Column =
    GraftColumnBridge.column(HammingDistance(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
