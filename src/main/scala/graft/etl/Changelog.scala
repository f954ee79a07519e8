package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.Relational.cents

/** Keyed-changelog application and slowly-changing-dimension history —
  * the ingestion-side mutation semantics of the reference's state
  * pipeline (scripts/crawler-queue.sh:131-176 upserts visited/frontier
  * state keyed by URL; DESIGN.md:855-916's resume flow re-applies the
  * latest state per key), generalized to the standard CDC shapes a
  * 100 TB training-data pipeline needs: MERGE-style upsert-apply and
  * SCD type-2 interval builds.
  *
  * Scale notes: every window and aggregate here is partitioned by the
  * entity key (order key / user id) — per-key sequential, corpus
  * parallel; the changelog reduction is one hash shuffle with map-side
  * max_by partials. No global windows anywhere.
  */
object Changelog {

  /** MERGE INTO semantics: apply a keyed changelog to a base snapshot.
    * Latest change per key wins (max_by over a per-key sequence),
    * upserts override or insert, deletes drop the row even when
    * present in base. One keyed shuffle for the reduction + one
    * key-partitioned full-outer join — the distributed upsert-apply
    * plan at any scale. The changelog is derived deterministically from
    * lineitem; the synthetic l_linenumber is NOT unique within an
    * order, so the sequence is the composite (linenumber, cents) packed
    * into one BIGINT — ties then carry identical (op, chg) payloads and
    * max_by stays engine-deterministic. Production feeds a real CDC
    * stream (whose sequence IS unique) through the same reduction.
    */
  /** The reusable operator: `base(key, value)` + `changes(key, seq, op,
    * value)` → applied state `(key, value, src)`. `op` ∈ upsert|delete;
    * highest `seq` per key wins (caller guarantees a total per-key
    * order — real CDC streams carry one). Idempotent: applying the
    * same changelog to its own output is a no-op (OpUnitSpec).
    */
  def applyChangelog(base: DataFrame, changes: DataFrame): DataFrame = {
    val latest = changes
      .groupBy(col("key"))
      .agg(max_by(col("op"), col("seq")).as("op"),
        max_by(col("value"), col("seq")).as("chg"))
    base.join(latest, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "delete")
      .select(col("key"),
        when(col("op") === "upsert", col("chg"))
          .otherwise(col("value")).as("new_value"),
        when(col("op").isNull, "base")
          .when(col("value").isNull, "inserted")
          .otherwise("updated").as("src"))
      .withColumnRenamed("new_value", "value")
  }

  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 4 =!= 3)
      .select(col("o_orderkey").as("key"), cents(col("o_totalprice")).as("value"))
    val changes = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("key"),
        (col("l_linenumber").cast("long") * 1000000000L +
          cents(col("l_extendedprice"))).as("seq"),
        when((col("l_orderkey") + col("l_linenumber")) % 11 === 0, "delete")
          .otherwise("upsert").as("op"),
        cents(col("l_extendedprice")).as("value"))
    applyChangelog(base, changes)
      .select(col("key").as("o_orderkey"), col("value").as("final_cents"),
        col("src"))
      .orderBy("o_orderkey")
  }

  /** Incremental view maintenance: merge a signed-delta aggregate into
    * a materialized base aggregate WITHOUT rescanning base facts — the
    * nightly-refresh pattern for every rollup a 100 TB warehouse keeps
    * (reference analog: the resume flow re-derives crawl report state
    * from deltas, DESIGN.md:855-916). Inserts carry (+1, +cents),
    * retractions (−1, −cents); an update is retract+insert. SUM/COUNT
    * are self-maintainable under retraction, so the refresh is
    * O(|delta| + |groups|): one aggregation over the delta, one
    * group-key full-outer merge against the stored rollup. (MIN/MAX
    * are not retraction-safe — they need the histogram-rank structures
    * of latency_percentiles.) The base aggregate is derived here for
    * determinism; production reads the stored MV. The oracle is the
    * full recompute over (base ∖ retracted) ∪ inserted — proving the
    * incremental path equals the rescan it avoids.
    */
  def ivmUpdate(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        cents(col("o_totalprice")).as("c"))
    val base = o.filter(col("o_orderkey") % 4 =!= 3)
    val baseAgg = base.groupBy(col("month"))
      .agg(count(lit(1)).as("bn"), sum(col("c")).as("bc"))
    val delta = o.filter(col("o_orderkey") % 4 === 3)
        .select(col("month"), lit(1L).as("dn"), col("c").as("dc"))
      .unionByName(base.filter(col("o_orderkey") % 7 === 0)
        .select(col("month"), lit(-1L).as("dn"), (-col("c")).as("dc")))
    val deltaAgg = delta.groupBy(col("month"))
      .agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
    mergeRollup(baseAgg, deltaAgg).orderBy("month")
  }

  /** The IVM merge step alone: `base(month, bn, bc)` ⟗ `delta(month,
    * dn, dc)` summed per group, groups whose count cancels to zero
    * dropped, delta-only groups born. OpUnitSpec pins the
    * cancellation/birth edges and empty-delta identity.
    */
  def mergeRollup(baseAgg: DataFrame, deltaAgg: DataFrame): DataFrame =
    baseAgg.join(deltaAgg, Seq("month"), "full_outer")
      .select(col("month"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("bc"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("rev_cents"))
      .filter(col("n_orders") > 0)

  /** SCD type-2 history build: collapse each user's event-type
    * run-length islands (gaps-and-islands via the lag-flag running-sum
    * trick) into validity intervals [valid_from, valid_to) with a
    * per-user version number; the current row keeps valid_to NULL.
    * All three windows are partitioned by user_id. Time is exact
    * integer epoch-µs (Events.tsUs ↔ DuckDB epoch_us) so interval
    * bounds hash-match across engines.
    */
  /** Point-in-time lookup against the SCD2 dimension: each event joins
    * the ONE validity interval covering its timestamp — the standard
    * event-time dimension lookup. The join is an equi-join on the
    * entity key with the interval bounds as residual predicates, so it
    * hash-partitions on user_id like everything else here; per-key
    * interval counts are bounded by that key's change history, never by
    * the corpus. (Contrast etl/AsOf.scala, which solves the UNKEYED
    * nearest-predecessor problem by time-binning.)
    */
  def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val dim = scd2Build(spark, dir)
      .select(col("user_id"), col("status"),
        col("valid_from_us"), col("valid_to_us"))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), Events.tsUs.as("ts_us"))
    ev.join(dim,
        ev("user_id") === dim("user_id") &&
        col("valid_from_us") <= col("ts_us") &&
        (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")))
      .select(col("event_id"), ev("user_id"), col("ts_us"), col("status"))
      .orderBy("event_id")
  }

  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type").as("status"),
        Events.tsUs.as("ts_us"), col("event_id"))
    val flagged = e.withColumn("chg",
      when(lag(col("status"), 1).over(w) <=> col("status"), 0L).otherwise(1L))
    val grouped = flagged.withColumn("grp",
      sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = grouped.groupBy(col("user_id"), col("grp"))
      .agg(min(col("status")).as("status"), // constant within the island
        min(col("ts_us")).as("valid_from_us"))
    val byStart = Window.partitionBy("user_id").orderBy("valid_from_us")
    islands.select(col("user_id"),
        row_number().over(byStart).as("version"),
        col("status"), col("valid_from_us"),
        lead(col("valid_from_us"), 1).over(byStart).as("valid_to_us"))
      .orderBy("user_id", "version")
  }
}
