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
  *
  * Epoch alignment: the fixtures put events in Jan-2024 but orders in
  * 1995-2001, so a raw ±3-day band can never match (round 10 shipped
  * exactly that — a 0-row "pass" that proved nothing). Orders are
  * re-epoched onto the events month deterministically: day-of-epoch
  * mod 31 laid onto Jan-2024 (pure integer arithmetic, identical
  * expression in the oracle), which overlaps events' Jan 1-30 span and
  * actually exercises the bucket-±1 fanout and the exact post-filter.
  */
object RangeJoin {

  val BandUs: Long = 3L * 24 * 3600 * 1000000 // ±3 days

  val DayUs: Long = 86400000000L
  val Jan1Us: Long = 1704067200000000L // 2024-01-01T00:00:00Z

  def eventsOrdersInBand(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").as("k"),
        expr(s"${Jan1Us}L + ((unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ))" +
          s" div ${DayUs}L) % 31) * ${DayUs}L").as("o_us"))
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id").as("k"), Events.tsUs.as("e_us"))
    bandCount(events, orders)
  }

  /** The binned rewrite itself, over generic keyed timelines — split out
    * so unit tests can drive it with hand-built in/out-of-band rows
    * (the parquet fixture exercise lives in [[eventsOrdersInBand]]).
    * `events`: (event_id, k, e_us); `orders`: (k, o_us). Emits one row
    * per event_id that has ≥1 order within ±[[BandUs]] on the same key.
    */
  def bandCount(events: DataFrame, orders: DataFrame): DataFrame = {
    val bucketed = orders.withColumn("bucket", floor(col("o_us") / lit(BandUs)))
    val fanned = events.withColumn("bucket", explode(array(
        floor(col("e_us") / lit(BandUs)) - 1,
        floor(col("e_us") / lit(BandUs)),
        floor(col("e_us") / lit(BandUs)) + 1)))
    fanned.join(bucketed, Seq("k", "bucket"))
      .filter(abs(col("e_us") - col("o_us")) <= BandUs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_orders_in_band"))
      .orderBy("event_id")
  }
}
