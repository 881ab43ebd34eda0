package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters
  * (`classic.ExpressionUtils`) private[sql], so third-party libraries
  * that define native Catalyst expressions host this one-file shim in
  * the org.apache.spark.sql package — the same approach used across
  * the public Spark extension ecosystem. Nothing else in this library
  * lives outside the graft namespace. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a raw LogicalPlan (`Dataset.ofRows` went
    * private[sql] the same way the Column converters did) — the entry
    * point for library-defined logical operators like
    * [[graft.plans.AsOfJoin.AsOfJoinPlan]]. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
