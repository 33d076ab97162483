package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Single-purpose bridge into Spark's `private[sql]` Dataset factory,
  * from a sub-package of `org.apache.spark.sql` (the standard technique
  * third-party Spark extensions — GraphFrames, Delta, Iceberg — use to
  * construct a DataFrame from a custom LogicalPlan, since Spark exposes
  * no public API for it). Nothing else may live in this package. */
object Shim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
