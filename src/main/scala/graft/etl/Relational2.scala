package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.Relational.cents

/** Second relational coverage wave: correlated-style filters via
  * windows, deep multi-join rollups, grouping sets, and pivot — the
  * breadth a "complete" engine owes its users beyond SURVEY §2's
  * literal inventory.
  */
object Relational2 {

  /** Orders above their customer's average — the correlated-subquery
    * shape done the Spark way: one window pass, no rejoin. Exact-cents
    * average as basis: compare on integer cents to avoid double ties.
    */
  def aboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, dir)
      .withColumn("cents", cents(col("o_totalprice")))
      .withColumn("cust_total", sum(col("cents")).over(w))
      .withColumn("cust_n", count(lit(1)).over(w))
      // strict integer comparison: price * n > total (no division)
      .filter(col("cents") * col("cust_n") > col("cust_total"))
      .select(col("o_custkey"), col("o_orderkey"),
        (col("cents") / lit(100.0)).as("o_totalprice"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q5-style local-supplier revenue: 6-table join with both bounded
    * dims broadcast; revenue only where customer and supplier share a
    * nation. lineitem shuffles once per join key — Catalyst orders the
    * joins; dims never induce exchanges.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey")
        && c("c_nationkey") === s("s_nationkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Q7-style cross-nation trade volume: supplier nation × customer
    * nation × ship year. Both nation dims and supplier broadcast (dim-
    * class at any SF); lineitem/orders/customer hash-join on their keys.
    */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = broadcast(Tables.supplier(spark, dir))
    val n1 = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(n1, s("s_nationkey") === col("s_nk"))
      .join(n2, c("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("ship_year"))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        / lit(10000.0)).as("volume"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** Q10-style returned-item revenue ranking: top-20 customers by
    * revenue lost to returns. Selective flag filter lands on the scan;
    * the final top-k is TakeOrdered (never a global sort at scale).
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** ROLLUP over the pricing flags with explicit grouping indicators
    * (subtotal rows carry NULL keys; grouping() disambiguates real
    * NULLs from rollup NULLs).
    */
  def rollupSales(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice"))) / lit(100.0)).as("total_price"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag"), col("l_linestatus"))

  /** Explicit GROUPING SETS — the cube/rollup sibling with a
    * hand-picked lattice: both one-dimension marginals plus the full
    * cross and the grand total, with grouping flags so consumers can
    * tell a NULL key from an aggregated-out dimension. Ordering by the
    * grouping flags first keeps every stratum's keys all-NULL or
    * all-present, so engine NULL-ordering differences can never bite
    * (rollupSales' trick). One pass, Expand + partial aggs — no
    * per-set rescan.
    */
  def groupingSetsSales(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag"), col("l_linestatus"))

  /** UNPIVOT (melt): the inverse of [[pivotFlags]] — the wide
    * status-per-column revenue table back to long (flag, status,
    * total_cents) rows via the first-class Dataset.unpivot verb (not a
    * hand-rolled stack of unions). Sums coalesce to 0 BEFORE the
    * unpivot: Spark keeps null cells where DuckDB's UNPIVOT drops them
    * by default, so a null would silently desync the engines. Exact
    * integer cents.
    */
  def unpivotFlags(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        coalesce(sum(when(col("l_linestatus") === "F",
          Relational.cents(col("l_extendedprice")))), lit(0L)).as("F"),
        coalesce(sum(when(col("l_linestatus") === "O",
          Relational.cents(col("l_extendedprice")))), lit(0L)).as("O"))
    wide.unpivot(Array(col("l_returnflag")), Array(col("F"), col("O")),
        "status", "total_cents")
      .orderBy("l_returnflag", "status")
  }

  /** Set operations (SURVEY §2.7): customers appearing in both/only-one
    * of two order-status universes — INTERSECT/EXCEPT as first-class
    * ops (semi/anti-join equivalents shown in semiAntiCustomers).
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct()
    val closed = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
    val both = open.intersect(closed).withColumn("membership", lit("both"))
    val onlyOpen = open.except(closed).withColumn("membership", lit("open_only"))
    val onlyClosed = closed.except(open).withColumn("membership", lit("closed_only"))
    both.unionByName(onlyOpen).unionByName(onlyClosed)
      .orderBy("o_custkey", "membership")
  }

  /** CUBE over the flags: all four grouping-set strata with indicators. */
  def cubeSales(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice"))) / lit(100.0)).as("total_price"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag"), col("l_linestatus"))

  /** Exact median (and quartiles would follow the same shape) computed
    * by rank selection over integer cents — engine-exact, unlike
    * percentile interpolation whose formulas differ across engines.
    * Median = mean of the two middle cents values (exact for even n,
    * degenerate for odd).
    */
  def medianPrice(spark: SparkSession, dir: String): DataFrame = {
    // Two-pass exact median over a VALUE HISTOGRAM, not a row window.
    // The naive form (row_number over Window.partitionBy(l_returnflag))
    // funnels all of lineitem through 3 tasks — three giant stragglers at
    // 100×. Instead:
    //   pass 1: groupBy(flag, cents) → counts. One hash-partitioned
    //           shuffle with map-side partial aggregation; the histogram
    //           is bounded by the price DOMAIN (distinct cents values),
    //           not the row count, so it stays small as data grows.
    //   pass 2: cumulative counts over the histogram locate which value
    //           holds each middle rank (rows with value v occupy ranks
    //           (cum_before, cum]). The low-cardinality window now only
    //           carries histogram rows.
    // Rank selection on cents stays engine-exact (no percentile
    // interpolation); output matches the row-window oracle bit-for-bit
    // because equal-rank rows share the same cents value by construction.
    val hist = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), cents(col("l_extendedprice")).as("cents"))
      .groupBy(col("l_returnflag"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    // Both windows share the partitioning → ONE tiny exchange of the
    // histogram; the group totals come from an unbounded frame over the
    // same data, so lineitem is scanned exactly once (a separate
    // `targets` aggregate would re-run the scan+agg).
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    hist.withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("cum_before", col("cum") - col("cnt"))
      .withColumn("r1", expr("(n + 1) div 2"))
      .withColumn("r2", expr("n div 2 + 1"))
      .withColumn("hits",
        when(col("r1") > col("cum_before") && col("r1") <= col("cum"), 1).otherwise(0)
          + when(col("r2") =!= col("r1")
            && col("r2") > col("cum_before") && col("r2") <= col("cum"), 1).otherwise(0))
      .filter(col("hits") > 0)
      .groupBy(col("l_returnflag"))
      .agg((sum(col("cents") * col("hits")).cast("double")
        / sum(col("hits")) / lit(100.0)).as("median_price"),
        sum(col("hits")).cast("bigint").as("n_mid"))
      .orderBy("l_returnflag")
  }

  /** Exact p25/p50/p75 in ONE pass — the [[medianPrice]] histogram
    * generalizes to any rank set for free: same (flag, cents) value
    * histogram, same tiny cumulative window, three target ranks
    * (rank_p = ceil(p·n) via integer math) selected by conditional
    * aggregation. This is why the histogram form beats per-row ranking
    * at scale: adding quantiles costs nothing, while the window form
    * would re-sort the table per rank set.
    */
  def quartilePrices(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), cents(col("l_extendedprice")).as("cents"))
      .groupBy(col("l_returnflag"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    val cum = hist.withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("cum_before", col("cum") - col("cnt"))
    def rankFor(pct: Int) = expr(s"(n * $pct + 99) div 100") // ceil(p·n)
    def valueAt(pct: Int) =
      (max(when(rankFor(pct) > col("cum_before") && rankFor(pct) <= col("cum"),
        col("cents"))) / lit(100.0)).as(s"p$pct")
    cum.groupBy(col("l_returnflag"))
      .agg(valueAt(25), valueAt(50), valueAt(75))
      .orderBy("l_returnflag")
  }

  /** Pivot: linestatus columns per returnflag (fixed value list keeps
    * the schema deterministic — never pivot on discovered values in a
    * verified pipeline). Physically conditional aggregation: one pass.
    */
  def pivotFlags(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("cents", cents(col("l_extendedprice")))
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg((sum(col("cents")) / lit(100.0)).as("total"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** The remaining analytic rank functions — percent_rank, cume_dist,
    * ntile(4) — per nation over customer balances (cents), completing
    * the §2.8 window surface beyond rank/dense_rank/row_number.
    * Cross-engine exactness: both are a SINGLE IEEE division of
    * identical small integers ((rank−1)/(n−1), rank/n) — correctly
    * rounded in both engines, so bit-identical without any rounding
    * discipline; ntile is pure integers. The ORDER BY carries a
    * custkey tie-break so ranks are total.
    *
    * Scale posture: one scan, one nation-keyed window pass (all three
    * functions share the same window ordering → ONE sort), output
    * sort. Nothing else.
    */
  def analyticRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("nation"))
      .orderBy(col("bal_c").asc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("nation"),
        cents(col("c_acctbal")).as("bal_c"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .select(col("c_custkey"), col("nation"), col("bal_c"),
        col("pct_rank"), col("cume"), col("quartile"))
      .orderBy("c_custkey")
  }
}
