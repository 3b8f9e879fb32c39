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
}
