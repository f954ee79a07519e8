package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-handling patterns (builder brief: "salting for skew, AQE for
  * runtime re-plan").
  *
  * `saltedAgg` is the classic two-phase aggregation: key is salted into
  * S shards, partially aggregated per (key, salt), then finally
  * aggregated per key. For a hot key this turns one straggler reducer
  * into S parallel ones. Results are EXACT (integer cents sums are
  * associative), so the query is oracle-checked against the plain
  * single-phase SQL — proving the rewrite is semantics-preserving.
  *
  * Salt derivation must be deterministic here (oracle!): orderkey % S.
  * In production use a random salt (`floor(rand()*S)`) — distribution
  * matters, determinism doesn't.
  */
object Skew {

  val Salts = 16

  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val partial = Tables.lineitem(spark, dir)
      .withColumn("salt", (col("l_orderkey") % Salts).cast("int"))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(Relational.cents(col("l_extendedprice"))).as("cents"),
        count(lit(1)).as("n"))
    partial
      .groupBy(col("l_returnflag"))
      .agg((sum(col("cents")) / lit(100.0)).as("total_price"),
        sum(col("n")).as("n_items"))
      .orderBy("l_returnflag")
  }
}
