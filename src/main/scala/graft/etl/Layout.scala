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
}
