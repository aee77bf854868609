package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: turn a resolved LogicalPlan into a
  * DataFrame. `classic.Dataset.ofRows` is package-private in Spark 4, so
  * this one-liner lives in the org.apache.spark.sql package — the
  * conventional extension-library technique (no Spark internals are
  * modified or shadowed).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Catalyst Expression → Column (`classic.ExpressionUtils.column` is
    * private[sql] in Spark 4). Needed where a custom expression takes an
    * argument no SQL literal syntax can carry efficiently — e.g. a
    * Bloom-filter image as a foldable binary literal.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The reverse direction: Column → Catalyst Expression (for wrapping an
    * arbitrary user Column as the argument of a custom expression).
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
