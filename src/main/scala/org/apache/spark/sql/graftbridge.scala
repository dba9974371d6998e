package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters — the
  * standard pattern for libraries that ship custom Catalyst expressions
  * (the converters are public API in spirit; only their package is
  * restricted). Kept to two forwarding calls, nothing else. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame — needed to hand a computed
    * one-row frame to a Catalyst `ScalarSubquery` (the shape Spark's own
    * `InjectRuntimeFilter` builds for bloom probes). */
  def analyzedPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
