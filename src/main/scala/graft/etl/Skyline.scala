package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.Relational.cents

/** Skyline (Pareto-front) queries — "best tradeoff" retrieval the
  * reference's report layer ranks pages for (relevance vs size,
  * commands/transform.md report tables) and every catalog/pricing
  * pipeline needs: the set of rows no other row dominates on ALL
  * criteria. Here: parts minimizing retail price while maximizing
  * size — a part is on the front iff no part is both cheaper-or-equal
  * and larger-or-equal with one strict.
  *
  * Scale design (the naive form is an O(n²) self-anti-join — a
  * cartesian product, banned by PlanSpec's sweep): the 2-D skyline is
  * order-reducible. Sort by price ascending; a point survives iff its
  * size exceeds every size seen at any strictly lower price, i.e. a
  * prefix-max. A single global window would funnel to one partition,
  * so the prefix-max is computed in two band-local phases, the same
  * sharded shape as Packing.paddingBatches / Urls.pageIdGen:
  *
  *  1. collapse to one row per distinct price (per-price max size +
  *     the count at that argmax pair) — one keyed shuffle;
  *  2. band by price range; the running max WITHIN a band is a
  *     band-partitioned window (parallel across bands); the max
  *     carried in FROM lower bands is a broadcast join against the
  *     tiny per-band aggregate (bands² pairs, bands = 64);
  *  3. survive iff size > greatest(in-band prefix max, lower-band max).
  *
  * No global ordering anywhere; both shuffles are on keys (price,
  * band) with partial aggregation. At 100 TB the phase-1 combine
  * collapses the input to |distinct prices| rows before any window.
  */
object Skyline {

  private val Bands = 64

  /** Pareto front over (minimize p_retailprice, maximize p_size):
    * distinct front pairs in integer cents, with the number of parts
    * tied at the pair. Output ordered by price (sizes then strictly
    * decrease — one front row per price at most, so the order is
    * total and deterministic).
    */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.part(spark, dir)
      .select(cents(col("p_retailprice")).as("price_c"), col("p_size"))
      .groupBy(col("price_c"), col("p_size"))
      .agg(count(lit(1)).as("n_parts"))

    // Phase 1: per-price champion — the max size at each price (any
    // smaller size at the same price is dominated outright).
    val perPrice = pairs
      .groupBy(col("price_c"))
      .agg(max(struct(col("p_size"), col("n_parts"))).as("best"))
      .select(col("price_c"), col("best.p_size").as("size"),
        col("best.n_parts").as("n_parts"))

    // Phase 2: band the price domain so each band's running max is an
    // independent window partition. ntile would need a global sort;
    // a fixed-width hash of the price ISN'T order-preserving — bands
    // must be price RANGES, so derive the width from the (broadcast)
    // global min/max: a 1-row aggregate, the scalar-subquery shape.
    val bounds = perPrice.agg(
      min(col("price_c")).as("lo"),
      (max(col("price_c")) - min(col("price_c")) + 1).as("span"))
    val banded = perPrice.crossJoin(broadcast(bounds))
      .withColumn("band",
        expr(s"((price_c - lo) * $Bands) div span").cast("int"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band")).orderBy(col("price_c"))
      .rowsBetween(Long.MinValue, -1)
    val inBand = banded.withColumn("prev_in_band", max(col("size")).over(w))

    // Lower-band carry: max size over all bands strictly below — a
    // bands×bands broadcast join over the 64-row per-band aggregate.
    val bandMax = banded.groupBy(col("band").as("b"))
      .agg(max(col("size")).as("band_max"))
    val carry = bandMax.as("lo_side")
      .join(broadcast(bandMax.select(col("b").as("hi"))), col("b") < col("hi"))
      .groupBy(col("hi")).agg(max(col("band_max")).as("prev_band_max"))

    inBand.join(broadcast(carry), col("band") === col("hi"), "left")
      .filter(col("size") > greatest(
        coalesce(col("prev_in_band"), lit(Int.MinValue)),
        coalesce(col("prev_band_max"), lit(Int.MinValue))))
      .select(col("price_c"), col("size"), col("n_parts"))
      .orderBy(col("price_c"))
  }
}
