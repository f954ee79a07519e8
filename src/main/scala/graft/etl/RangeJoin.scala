package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Range (band) join, composed scalably: a naive |t1 - t2| <= W join is
  * a BroadcastNestedLoopJoin (quadratic); the scale form BINS time into
  * W-sized buckets, equi-joins on (key, bucket) for the three candidate
  * buckets (b-1, b, b+1), and post-filters the exact band — turning an
  * inequality join into a bounded-fanout hash join. Standard interval-
  * join technique (also how Structured Streaming implements stream-
  * stream time-bound joins).
  *
  * Instance: per event, how many orders the same user placed within
  * ±3 days. Oracle: DuckDB's plain inequality join (its optimizer makes
  * theta joins cheap at oracle scale) — same counts prove the binned
  * rewrite exact.
  */
object RangeJoin {

  val BandUs: Long = 3L * 24 * 3600 * 1000000 // ±3 days

  def eventsOrdersInBand(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").as("k"),
        unix_micros(col("o_orderdate").cast("timestamp_ltz")).as("o_us"))
      .withColumn("bucket", floor(col("o_us") / lit(BandUs)))
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id").as("k"), Events.tsUs.as("e_us"))
      .withColumn("bucket", explode(array(
        floor(col("e_us") / lit(BandUs)) - 1,
        floor(col("e_us") / lit(BandUs)),
        floor(col("e_us") / lit(BandUs)) + 1)))
    events.join(orders, Seq("k", "bucket"))
      .filter(abs(col("e_us") - col("o_us")) <= BandUs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_orders_in_band"))
      .orderBy("event_id")
  }
}
