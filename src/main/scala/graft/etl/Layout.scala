package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * A single-column sort gives parquet min/max pruning on ONE
  * predicate dimension; interleaving the bits of two bucketed
  * dimensions into a Morton key and range-partitioning on it gives
  * every output file a small min/max envelope in BOTH dimensions, so
  * scans filtered on either (or both) skip most files. This is the
  * layout trick behind Delta/Iceberg Z-ORDER compaction, expressed as
  * plain integer Column arithmetic — no UDF, fully codegen'd.
  *
  * Scale posture: the key computation is map-only; the layout write is
  * `repartitionByRange(zkey)` + sortWithinPartitions (one shuffle, the
  * same cost as any sorted write). The query below inspects the
  * layout instead of writing it: it groups rows by their target file
  * and reports each file's per-dimension envelope — the numbers a
  * 100 TB table's pruning ratio is read from (64 files over a 256×256
  * key space → each file's envelope is a 32×32 tile, i.e. a predicate
  * on either dimension touches ~1/8 of the files, vs all of them
  * under a single-dim sort on the other column).
  */
object Layout {

  /** Bits per dimension in the Morton key (256 buckets/dim). */
  val Bits = 8

  /** Target file count for the layout inspection (64 → 1024 Morton
    * codes per file → 32×32 tiles).
    */
  val Files = 64

  /** Interleave the low [[Bits]] bits of x (even positions) and y (odd
    * positions) into a Morton code. Pure shifts/masks — codegen'd,
    * engine-exact.
    */
  def morton(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-order layout audit over events: bucket (user_id, hour-of-epoch)
    * to 8 bits each, Morton-interleave, assign each row to its target
    * file (64 range slices of the key space), and report every file's
    * row count and min/max envelope in BOTH dimensions. All integer
    * math (`ts` is BIGINT nanoseconds at read time; hours = µs div
    * 3.6e9); deterministic and oracle-exact.
    *
    * NONNEGATIVE-INPUT ASSUMPTION (cross-engine): Spark `pmod`/`div`
    * (positive remainder / truncation) and the oracle's DuckDB `%`/`//`
    * agree ONLY for nonnegative operands — a negative user_id or
    * pre-epoch ts would diverge silently (pmod(-1,256)=255 vs
    * -1%256=-1). Both columns are nonnegative by the corpus schema
    * (ids and event timestamps); a deployment over signed keys must
    * normalize first or mirror one engine's remainder convention on
    * both sides.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val codesPerFile = (1 << (2 * Bits)) / Files
    Tables.events(spark, dir)
      .select(
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("(ts div 1000) div 3600000000"), lit(256L)).as("yb"))
      .withColumn("zkey", morton(col("xb"), col("yb")))
      .withColumn("file_id", expr(s"zkey div $codesPerFile"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("xb")).as("x_min"), max(col("xb")).as("x_max"),
        min(col("yb")).as("y_min"), max(col("yb")).as("y_max"))
      .withColumn("x_span", col("x_max") - col("x_min") + 1)
      .withColumn("y_span", col("y_max") - col("y_min") + 1)
      .orderBy("file_id")
  }

  /** Min/max data-skipping audit — the number the [[zorderLayout]]
    * story is ultimately about: how many files a predicate can SKIP
    * from footer stats alone. Simulates two 64-file layouts of
    * lineitem (the "natural" insertion order — files are l_orderkey
    * ranges — and a shipdate-clustered layout — files are ship-day
    * ranges), records each file's min/max ship-day envelope, applies
    * the classic one-year predicate (l_shipdate in 1994, TPC-H q6's
    * range), and reports per layout: files skipped (envelope disjoint
    * from the range), rows scanned vs rows actually matching, and the
    * scan mass in basis points. The natural layout scans ~everything
    * (every orderkey range spans all dates); the clustered layout
    * scans ~1/7 — the measured argument for sorted/Z-ordered writes
    * that parquet row-group pruning turns into wall-clock at 100 TB.
    *
    * All integer (days since 1992-01-01); file widths derive from the
    * key-space extremes via 1-row broadcast aggregates; per-file stats
    * are file-keyed aggs; the 2-row output aggregates the 64-row file
    * frames. Two pruned 2-column scans, nothing else.
    */
  def minmaxPrune(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        datediff(col("l_shipdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long").as("day"))
    val dLo = datediff(lit("1994-01-01").cast("date"), lit("1992-01-01").cast("date"))
    val dHi = datediff(lit("1994-12-31").cast("date"), lit("1992-01-01").cast("date"))

    def audit(layout: String, in: DataFrame, fileId: Column): DataFrame = {
      val files = in.withColumn("file_id", fileId)
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("day")).as("d_min"), max(col("day")).as("d_max"),
          sum((col("day").between(dLo, dHi)).cast("long")).as("n_match"))
        .withColumn("skip",
          (col("d_max") < dLo || col("d_min") > dHi).cast("long"))
      files.agg(
          count(lit(1)).as("n_files"),
          sum(col("skip")).as("n_skipped"),
          sum(when(col("skip") === 0L, col("n_rows")).otherwise(0L))
            .as("rows_scanned"),
          sum(col("n_match")).as("rows_match"),
          sum(col("n_rows")).as("rows_total"))
        .select(lit(layout).as("layout"), col("n_files"), col("n_skipped"),
          col("rows_scanned"), col("rows_match"),
          expr("(10000 * rows_scanned) div rows_total").as("scan_bp"))
    }

    // natural layout: files are contiguous l_orderkey ranges
    val okMax = base.agg(max(col("l_orderkey")).as("ok_max"))
    val natural = audit("natural",
      base.crossJoin(broadcast(okMax)),
      expr("l_orderkey div (ok_max div 64 + 1)"))
    // clustered layout: files are contiguous ship-day ranges
    val dayExt = base.agg(min(col("day")).as("day_min"),
      max(col("day")).as("day_max"))
    val clustered = audit("shipdate_clustered",
      base.crossJoin(broadcast(dayExt)),
      expr("(day - day_min) div ((day_max - day_min) div 64 + 1)"))

    natural.unionByName(clustered).orderBy("layout")
  }
}
