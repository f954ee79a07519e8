package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.Relational.cents

/** Third relational coverage wave — the classic decision-support query
  * shapes still missing after Relational/Relational2: pushdown-only
  * scan-aggregate, market share, product profit, outer-join
  * distribution, scalar-subquery max/avg thresholds, correlated
  * per-group avg join-back, group-having semi-join, disjunctive band
  * predicates, only-late-supplier double aggregation, and min-cost
  * join-back (reference query surface: commands/transform.md:200-320's
  * report aggregations generalized to the driver's TPC-H-ish tables).
  *
  * Scale notes common to the wave:
  *  - scalar subqueries (global max / avg / total) are computed as
  *    1-row aggregates and broadcast — the canonical distributed plan
  *    for `x > (SELECT agg(..) FROM ..)`; never a window over an
  *    unpartitioned frame;
  *  - "correlated" per-group thresholds are one partial-agg shuffle on
  *    the group key followed by a shuffle-free join-back on that same
  *    key (Spark reuses the exchange);
  *  - money math stays in integer cents end-to-end (Relational.cents);
  *    rational thresholds are cross-multiplied (5·n·qty < Σqty, not
  *    qty < 0.2·avg) so both engines compare exact integers.
  */
object Relational3 {

  private def tsLit(s: String) = to_timestamp(lit(s))

  /** Q6-style revenue forecast: pure scan→filter→aggregate, zero joins,
    * zero shuffles beyond the final 1-row combine. The point at 100 TB
    * is the scan: all three predicates reach parquet (PushedFilters)
    * and only 4 columns are read (ReadSchema) — PlanSpec asserts both.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame = {
    val discBp = cents(col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= tsLit("1997-01-01") &&
        col("l_shipdate") < tsLit("1998-01-01") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 24)
      .agg(
        (sum(cents(col("l_extendedprice")) * discBp) / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q8-style market share: of all revenue flowing to ASIA customers,
    * the fraction supplied by NATION_3, per order year. Both nation
    * copies + region + supplier broadcast; the share is reported in
    * integer basis points (num·10000 DIV denom) so the division is
    * engine-exact.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = broadcast(Tables.supplier(spark, dir))
    val nc = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey")))
    val ns = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val r = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
    val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(nc, c("c_nationkey") === col("c_nk"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(ns, s("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0L))).as("num"),
        sum(rev).as("denom"))
      .select(col("o_year"),
        expr("num * 10000 DIV denom").as("mkt_share_bp"),
        (col("denom") / lit(10000.0)).as("total_revenue"))
      .orderBy("o_year")
  }

  /** Q9-style product profit: for parts named like '%red%', profit =
    * discounted revenue minus retail-cost·qty, by supplier nation and
    * ship year. part/supplier/nation all broadcast (dim-class);
    * lineitem shuffles once for the group-by.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = broadcast(Tables.part(spark, dir).filter(col("p_name").contains("red")))
    val s = broadcast(Tables.supplier(spark, dir))
    val n = broadcast(Tables.nation(spark, dir))
    // both terms in cents·ticks (1e-4 dollar) units: revenue carries the
    // (100 - bp) tick factor, cost is scaled by 100 explicitly
    val amount = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) -
      cents(col("p_retailprice")) * col("l_quantity").cast("bigint") * lit(100L)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(n, s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("int").as("o_year"))
      .agg((sum(amount) / lit(10000.0)).as("profit"),
        count(lit(1)).as("n_items"))
      .orderBy("nation", "o_year")
  }

  /** Q13-style order distribution: customers × their non-urgent order
    * count (outer join keeps zero-order customers), then the histogram
    * of those counts. Two shuffles (custkey, then count) — both on
    * high-cardinality keys, no skew.
    */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15-style top supplier: revenue per supplier for 1997 shipments,
    * keeping every supplier tied at the global max. The max is a 1-row
    * broadcast (scalar subquery done the distributed way), joined back
    * on exact integer cents — no second scan of lineitem.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revs = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= tsLit("1997-01-01") &&
        col("l_shipdate") < tsLit("1998-01-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("rev_units"))
    val mx = broadcast(revs.agg(max(col("rev_units")).as("mx")))
    revs.join(mx, col("rev_units") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_units") / lit(10000.0)).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q17-style small-quantity revenue: lines of Brand#5 small parts
    * whose quantity is below 20% of that part's average. The per-part
    * average is a partial-agg shuffle on l_partkey; the join-back reuses
    * the same key. Threshold cross-multiplied: 5·n·qty < Σqty.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = broadcast(Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#5" && col("p_size") <= 25)
      .select("p_partkey"))
    val lines = Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("bigint").as("qty"),
        cents(col("l_extendedprice")).as("price_cents"))
    val stats = lines.groupBy(col("l_partkey").as("sk"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_lines"))
    lines.join(stats, col("l_partkey") === col("sk"))
      .filter(col("qty") * lit(5L) * col("n_lines") < col("sum_qty"))
      .agg((sum(col("price_cents")) / lit(100.0)).as("small_qty_revenue"),
        count(lit(1)).as("n_small"))
  }

  /** Q18-style large orders: orders whose line quantities sum past 250
    * (group-by + having as a semi-join back to orders/customer). The
    * having-filter runs before the join — only qualifying orderkeys
    * reach the join, so the join input is tiny at any scale.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    big.join(o, col("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        (cents(col("o_totalprice")) / lit(100.0)).as("o_totalprice"),
        col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Q19-style disjunctive band predicates: three (brand, size, qty)
    * bands OR-ed across the lineitem ⋈ part join. part is broadcast;
    * the disjunction stays a single join pass (no union-of-three-scans)
    * and the partkey equi-key still drives the join.
    */
  def q19DisjunctiveBands(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = broadcast(Tables.part(spark, dir))
    val qty = col("l_quantity")
    val band1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && qty.between(1, 20)
    val band2 = col("p_brand") === "Brand#12" && col("p_size").between(10, 30) && qty.between(10, 30)
    val band3 = col("p_brand") === "Brand#23" && col("p_size").between(20, 50) && qty.between(20, 45)
    l.join(p, l("l_partkey") === p("p_partkey") && (band1 || band2 || band3))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q21-style only-late supplier: orders served by ≥2 suppliers where
    * exactly one supplier shipped >1000 days after the order date; count
    * offending orders per supplier. The classic EXISTS / NOT EXISTS
    * self-join pair is re-expressed as TWO keyed aggregations (per
    * (order, supplier), then per order) — no self-join, no correlated
    * re-scan; at 100 TB this is two shuffles on high-cardinality keys.
    */
  def q21OnlyLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val lines = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 1000, lit(1L))
          .otherwise(lit(0L)).as("late"))
    val perSupp = lines.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(col("supp_late")).as("n_late"),
        max(when(col("supp_late") === 1, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    perOrder.join(broadcast(Tables.supplier(spark, dir)),
        col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q22-style idle rich customers: above-average positive balance, no
    * order since 1999 (the synthetic corpus gives every customer SOME
    * order, so "idle" is recency-scoped). The global average is a 1-row
    * broadcast compared by cross-multiplication (bal·n > Σbal); the
    * idleness test is a distributed left-anti join whose right side is
    * filtered before the join — not a NOT IN subquery re-scan.
    */
  def q22IdleRich(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val thresh = broadcast(c.filter(col("c_acctbal") > 0)
      .agg(sum(cents(col("c_acctbal"))).as("tot_pos"), count(lit(1)).as("n_pos")))
    val rich = c.crossJoin(thresh)
      .filter(cents(col("c_acctbal")) * col("n_pos") > col("tot_pos"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= tsLit("1999-01-01"))
      .select("o_custkey")
    rich.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        (sum(cents(col("c_acctbal"))) / lit(100.0)).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** Q2-style min-cost supplier: for each small part (size ≤ 5), the
    * supplier offering its cheapest line, ties broken by lowest
    * suppkey. One aggregation with a lexicographic struct-min — no
    * window sort, no join-back on the min value (min(struct(price,
    * suppkey)) carries the winning supplier out of the same shuffle).
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val p = broadcast(Tables.part(spark, dir).filter(col("p_size") <= 5)
      .select("p_partkey", "p_brand"))
    val mins = Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_brand"))
      .agg(min(struct(cents(col("l_extendedprice")).as("c"),
        col("l_suppkey").as("sk"))).as("m"))
    mins.join(broadcast(Tables.supplier(spark, dir)),
        col("m.sk") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"),
        (col("m.c") / lit(100.0)).as("min_price"),
        col("s_suppkey"), col("s_name"))
      .orderBy("p_partkey")
  }

  /** Q11-style important parts: parts whose discounted revenue exceeds
    * 1.5× the per-part average (threshold scales with |parts|, unlike
    * an absolute share cut, so the query is non-degenerate at every
    * SF). Per-part partial-agg shuffle + 1-row broadcast total; the
    * share test is integer-cross-multiplied (rev·n·2 > total·3).
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val revs = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("rev_units"))
    val tot = broadcast(revs.agg(sum(col("rev_units")).as("total"),
      count(lit(1)).as("n_parts")))
    revs.crossJoin(tot)
      .filter(col("rev_units") * col("n_parts") * lit(2L) > col("total") * lit(3L))
      .select(col("l_partkey"), (col("rev_units") / lit(10000.0)).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** Q16-style supplier counts: distinct suppliers per (brand, type,
    * size) bucket of the part catalog, excluding one brand/type slice
    * and suppliers with negative balance (the "complaints" NOT IN
    * subquery). The exclusion list is tiny → broadcast LEFT ANTI (never
    * a NOT IN re-scan); part is dim-class → broadcast; the distinct
    * count is Spark's two-phase distinct aggregate (partial distinct on
    * (bucket, suppkey), then count) — no per-group set state.
    */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val p = broadcast(Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size"))
    val complained = broadcast(Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey"))
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(complained, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q20-style excess shippers: suppliers who, for some 'red' part,
    * shipped more than half of that part's total 1997 quantity (the
    * classic nested-IN "excess availability" shape re-keyed to the
    * lineitem supply relation). Per-(part, supplier) totals are one
    * shuffle; the per-part denominator is a WINDOW over the already-
    * aggregated pairs (medianPrice pattern: one exchange, one scan —
    * never a join-back that re-reads lineitem); the winner set is a
    * distinct semi-join into broadcast supplier/nation dims.
    */
  def q20ExcessShippers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = broadcast(Tables.part(spark, dir)
      .filter(col("p_name").contains("red")).select("p_partkey"))
    val pairs = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= tsLit("1997-01-01") &&
        col("l_shipdate") < tsLit("1998-01-01"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("bigint")).as("pair_qty"))
    val excess = pairs
      .withColumn("part_qty",
        sum(col("pair_qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("pair_qty") * lit(2L) > col("part_qty"))
      .select("l_suppkey").distinct()
    excess
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
      .orderBy("s_suppkey")
  }

  /** Calendar gap-fill: Brand#5 daily shipment series with explicit
    * zero rows for the 1000+ days with no shipments (time-series
    * completeness — the shape every downstream forecaster/anomaly job
    * needs). The date axis is generated from the 1-row min/max bounds
    * (sequence + explode) and LEFT-joined against the daily aggregate;
    * both sides are tiny post-aggregation, so the join broadcasts. The
    * pruned lineitem⋈part scan is read twice (bounds + daily) — two
    * cheap 4-column scans beat funneling the axis through a global
    * window.
    */
  def gapFillDays(spark: SparkSession, dir: String): DataFrame = {
    def daily = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_brand") === "Brand#5").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("bigint")).as("qty"))
    val axis = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    axis.join(broadcast(daily), Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("qty"), lit(0L)).as("qty"))
      .orderBy("day")
  }

  /** Repeat-customer profile: per customer, order count, distinct
    * active months, and first/last active month — kept only for
    * customers active in ≥2 months (the retention base table). One
    * shuffle on the customer key; the distinct-month count is a
    * two-phase distinct aggregate, never a window.
    */
  def repeatCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("month")).as("n_months"),
        min(col("month")).as("first_month"),
        max(col("month")).as("last_month"))
      .filter(col("n_months") >= 2)
      .orderBy("o_custkey")

  /** Month-over-month revenue bridge: per-month revenue (integer
    * cents) with the previous month's revenue and the delta. The
    * month axis is tiny and FIXED-size relative to the data (80 rows
    * here, a few hundred at any horizon), so "lag" is a broadcast
    * self-join on month-1 — not a global-ORDER-BY window, which would
    * funnel through one task and trip the PlanSpec sweep.
    */
  def monthlyRevenueDelta(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(spark, dir)
      .select(to_date(date_trunc("month", col("o_orderdate"))).as("month_d"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("month_d")).agg(sum(col("c")).as("rev_cents"))
    val prev = m.select(col("month_d").as("prev_d"),
      col("rev_cents").as("prev_cents"))
    m.join(broadcast(prev), add_months(col("month_d"), -1) === col("prev_d"), "left")
      .select(date_format(col("month_d"), "yyyy-MM").as("month"),
        col("rev_cents"), col("prev_cents"),
        (col("rev_cents") - col("prev_cents")).as("delta_cents"))
      .orderBy("month")
  }

  /** RFM customer segmentation (Hughes 1994, the direct-marketing
    * classic): each customer banded on Recency (days since their last
    * order, against the corpus-max order date), Frequency (order
    * count), and Monetary (lifetime cents), then rolled up per
    * (r, f, m) segment — the "champions / at-risk / hibernating" grid
    * a CRM reads. Bands are FIXED business thresholds (R: 30/90/180/
    * 365 d; F: 1/2/4/8 orders; M: power-of-10 cents), not data
    * quantiles — deterministic, comparable across runs, and free of
    * the unpartitioned ntile window quantile-banding would need.
    *
    * Scale posture: one customer-keyed agg (the reduction), a 1-row
    * max-date broadcast, map-side banding, one segment agg. Output
    * bounded by the 5×5×5 band grid.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("o_custkey"))
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("freq"),
        sum(col("c")).as("money_c"))
    val end = per.agg(max(col("last_d")).as("end_d"))
    val banded = per.crossJoin(broadcast(end))
      .withColumn("recency_d", datediff(col("end_d"), col("last_d")))
      .withColumn("r_band",
        when(col("recency_d") < 30, 0).when(col("recency_d") < 90, 1)
          .when(col("recency_d") < 180, 2).when(col("recency_d") < 365, 3)
          .otherwise(4))
      .withColumn("f_band",
        when(col("freq") < 2, 0).when(col("freq") < 4, 1)
          .when(col("freq") < 8, 2).when(col("freq") < 16, 3).otherwise(4))
      .withColumn("m_band",
        when(col("money_c") < 1000000L, 0)
          .when(col("money_c") < 10000000L, 1)
          .when(col("money_c") < 100000000L, 2)
          .when(col("money_c") < 1000000000L, 3).otherwise(4))
    banded.groupBy(col("r_band"), col("f_band"), col("m_band"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("money_c")).as("segment_cents"),
        expr("sum(freq)").as("segment_orders"))
      .orderBy("r_band", "f_band", "m_band")
  }
}
