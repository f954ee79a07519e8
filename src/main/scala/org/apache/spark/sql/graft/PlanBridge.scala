package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge. `Dataset.ofRows` went private[sql]
  * (Spark 4 classic split); custom logical operators handed to the
  * planner need this one-hop shim — same pattern as [[ColumnBridge]].
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Unpersist the block-manager blocks behind a `localCheckpoint()`ed
    * frame (its analyzed plan is a `LogicalRDD` over the checkpointed
    * RDD — `Dataset.unpersist` can't reach it: that only clears the
    * SQL CacheManager). Safe once nothing downstream will re-read the
    * frame; a later action on it would fail (lineage is truncated), so
    * callers release only intermediates whose final consumer has been
    * materialized. No-op for non-LogicalRDD plans.
    */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** The reliable-checkpoint directory backing a frame returned by
    * `Fixpoint.reliably` (its analyzed plan is a `LogicalRDD` over a
    * reliably-checkpointed RDD; `getCheckpointFile` is that RDD's
    * on-disk `rdd-N` directory). None for frames that aren't
    * checkpoint scans — including localCheckpoint'ed ones, whose
    * state lives in the block manager, not in files.
    */
  def checkpointFile(df: DataFrame): Option[String] =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.getCheckpointFile
      case _ => None
    }
}
