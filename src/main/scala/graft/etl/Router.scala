package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §3.3: the output-transformer's cost-based strategy router — the
  * reference's plan selection (output-transformer.md:95-113,
  * config/limits.yaml:143-163): statistics are page count + byte size,
  * the cost model is a context budget, and the chosen plan trades
  * fidelity for safety:
  *
  *   pages ≤ 5 ∧ chars ≤ 30K → direct
  *   pages ≤ 10 ∧ chars ≤ 60K → summarize_first
  *   else                     → index_only
  *
  * Relationally this is an aggregate + a case expression per group —
  * the adaptive-plan-choice idea AQE applies to joins, applied to
  * output fidelity.
  */
object Router {

  def transformRoute(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pages"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("strategy",
        when(col("n_pages") <= 5 && col("total_chars") <= 30000, "direct")
          .when(col("n_pages") <= 10 && col("total_chars") <= 60000, "summarize_first")
          .otherwise("index_only"))
      .orderBy("source")

  /** Exact distinct aggregation (the reference's dedup-count analog);
    * the HLL approx path (approx_count_distinct) is library API +
    * unit-tested within tolerance — sketches aren't cross-engine
    * comparable, so only the exact form is oracle-checked.
    */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
}
