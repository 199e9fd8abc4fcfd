package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` Dataset construction — the standard pattern
  * for libraries that add custom logical operators (the public API has no
  * "DataFrame from LogicalPlan" entry point).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan

  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** The persisted RDD backing a (local)checkpointed Dataset — None when the
    * plan is not a checkpoint leaf. Iterative driver loops use it to release
    * a finished round's storage blocks once the next round is materialized;
    * without that, per-round `localCheckpoint(true)` blocks accumulate for
    * the application lifetime.
    */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] = {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.execution.LogicalRDD
    // a checkpoint leaf, possibly under the state-narrowing projection the
    // iterative loops apply (`next.select(...)`) — deliberately NOT a deep
    // collect, which could reach a checkpoint the caller owns
    logicalPlan(df) match {
      case lr: LogicalRDD => Some(lr.rdd)
      case Project(_, lr: LogicalRDD) => Some(lr.rdd)
      case _ => None
    }
  }

  /** Unpersist the checkpoint blocks behind `df` (no-op for non-checkpoint
    * plans; never throws — cleanup must not fail the query).
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach { r =>
      try r.unpersist(blocking = false) catch { case _: Exception => () }
    }
}
