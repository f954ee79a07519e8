package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of join — the canonical "operator Spark lacks" (SURVEY.md §2.6
  * notes the reference has none either; this is north-star surface).
  * Implemented by COMPOSITION (preference order (a) in the builder
  * brief): union both sides with a side marker, sort within the key
  * partition by (time, marker), and carry the last left-side payload
  * forward — one shuffle on the key, one sort, no custom Strategy
  * needed. The DuckDB oracle uses its NATIVE ASOF JOIN, so the
  * composition is verified against a reference implementation.
  *
  * Instance: each event joined to the same user's most recent order
  * (orderdate ≤ event time). Order times are day-granular, so orders
  * are pre-collapsed to one row per (custkey, date) — max orderkey wins
  * — making the as-of match unique and both engines deterministic.
  */
object AsOf {

  /** Generic as-of: for every row of `right` (key, t), attach the last
    * `left` payload with left.t <= right.t. Columns: both frames need
    * `k` (key) and `t_us` (bigint time); left carries `payload` cols.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
      payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(0))
    val r = right.withColumn("__side", lit(1))
    val payloadNulled = payload.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }
    val unioned = l.select(("k" +: "t_us" +: "__side" +: payload).map(col) ++
        Seq(lit(null).cast("bigint").as("__rid")): _*)
      .unionByName(payloadNulled.select(("k" +: "t_us" +: "__side" +: payload)
        .map(col) :+ col("__rid"): _*))
    // order rows first at equal time (ASOF is <=); LOCF via last(ignoreNulls)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t_us").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** Verified query: events ⨝asof orders on user/customer key. */
  def eventsAsofOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .withColumn("t_us", unix_micros(col("o_orderdate").cast("timestamp_ltz")))
      .groupBy(col("o_custkey").as("k"), col("t_us"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
    val events = Tables.events(spark, dir)
      .select(col("user_id").as("k"), Events.tsUs.as("t_us"),
        col("event_id").as("__rid"))
    asOfJoin(orders, events, Seq("last_orderkey"))
      .select(col("__rid").as("event_id"), col("k").as("user_id"),
        col("t_us").as("ts_us"), col("last_orderkey"))
      .orderBy("event_id")
  }
}
