package org.apache.spark.sql.graftglue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` door the engine needs: turning a custom
  * [[LogicalPlan]] node into a DataFrame. Spark exposes no public
  * constructor for this, so — like every Spark extension library — we
  * open it from a package under `org.apache.spark.sql`. Nothing else
  * lives here; all graft logic stays in the `graft` packages.
  */
object Glue {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The Catalyst expression behind a Column (Spark 4 hides it behind
    * the ColumnNode indirection; needed for stats-based file pruning). */
  def expr(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
