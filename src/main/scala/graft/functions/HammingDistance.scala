package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

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

  // ExpectsInputTypes is off limits (AbstractDataType is private[sql] in
  // Spark 4), so validate at analysis time by hand — otherwise non-bigint
  // SQL arguments would reach eval and throw ClassCastException.
  override def checkInputDataTypes(): TypeCheckResult = {
    // NullType stays legal: a null literal argument yields null (the
    // BinaryExpression null short-circuit) exactly as before the check
    def ok(t: DataType) = t == LongType || t == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two bigint arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

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
