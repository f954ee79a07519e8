package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

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

  /** Data-profiling report (the precheck every ingest pipeline runs
    * before trusting a new drop): per column — null count, exact
    * distinct count, min/max — in ONE table pass. The multi-column
    * exact countDistinct plans as a single Expand-based aggregate (one
    * scan, one shuffle of partial aggs; data duplicated |cols|× inside
    * the Expand, never re-scanned); the 1-row wide result then unpivots
    * via stack(). min/max aggregate in the column's NATIVE type and cast
    * to string only at the surface (display form, not lexicographic
    * numerics). At 100 TB you'd swap countDistinct for
    * approx_count_distinct (same plan minus the Expand — see
    * Router.distinctSketch for the sketch tier).
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val cols = Seq("l_returnflag", "l_linestatus", "l_suppkey", "l_partkey")
    val aggs = cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c")) }
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val wide = l.agg(allAggs.head, allAggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', nulls_$c, nd_$c, min_$c, max_$c").mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${cols.length}, $stackArgs) AS " +
          "(column_name, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy("column_name")
  }
}
