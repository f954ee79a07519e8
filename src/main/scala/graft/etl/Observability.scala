package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A10: IR run-statistics (chars, docs, skips, errors) as `observe()`
  * metrics — accumulated ON the executors during the normal pass, read
  * from the driver after the action. The Spark-native form of the
  * reference's IR.stats counters (DESIGN.md:1092-1099): no second scan,
  * no collect.
  */
object Observability {

  /** Attach the standard document-pipeline counters to any docs frame
    * (columns: text, n_chars). Read back via
    * `df.queryExecution.observedMetrics("graft_stats")` after an action.
    */
  def withDocStats(docs: DataFrame): DataFrame =
    docs.observe("graft_stats",
      count(lit(1)).as("docs_seen"),
      sum(coalesce(col("n_chars"), lit(0L))).as("chars_total"),
      count(when(length(coalesce(col("text"), lit(""))) === 0, 1))
        .as("docs_empty"),
      max(col("n_chars")).as("chars_max"))
}
