package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** The one place graft touches `private[sql]` surface: turning a custom
  * [[LogicalPlan]] into a public DataFrame, and registering an extra
  * planner strategy at runtime. Lives inside the org.apache.spark.sql
  * namespace for exactly that access — the standard packaging pattern for
  * Spark extension libraries that expose custom operators.
  */
object SqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a strategy to the session's experimental list —
    * the runtime-registration path; cluster deployments get the same
    * strategy via spark.sql.extensions (graft.functions.GraftExtensions).
    */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
