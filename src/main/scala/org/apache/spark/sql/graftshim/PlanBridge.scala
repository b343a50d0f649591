package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, ExperimentalMethods, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Spark 4 moved `Dataset.ofRows` and the analyzed-plan accessor into the
  * `classic` implementation module (`private[sql]`); this shim re-exports
  * the three entry points graft's custom logical plans need — the same
  * extension-library pattern as [[ColumnBridge]]. No Spark internals are
  * modified.
  */
object PlanBridge {
  /** Wrap an already-resolved logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Public per-session registry for extra planner strategies /
    * optimizer rules (`spark.experimental`).
    */
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[classic.SparkSession].experimental
}
