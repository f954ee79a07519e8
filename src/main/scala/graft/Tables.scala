package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Parquet table loaders for the driver-generated synthetic tables
  * (see TESTDATA.md / FIXTURES.md §1). Schemas are fixed by the driver;
  * we read them as-is (parquet carries the schema) and never infer from
  * JSON/CSV. At cluster scale these reads are partition-pruned and
  * column-pruned by Catalyst as long as downstream code selects/filters
  * declaratively — keep everything DataFrame-first.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = withNanosTs(apply(s, d, "events"))

  /** Canonicalize `events.ts` to BIGINT epoch-nanoseconds regardless of
    * how the parquet writer encoded it. The driver has shipped two
    * encodings: TIMESTAMP(NANOS) (read as LongType under
    * spark.sql.legacy.parquet.nanosAsLong) and timestamp[us] (read as
    * TIMESTAMP_NTZ). All temporal queries assume integer-nanos `ts`
    * (Events.tsUs = `ts div 1000` — exact epoch-µs math, no double
    * drift), so the conversion lives here at the reader boundary, once.
    * The µs→ns multiply is exact (epoch-µs ≈ 1.7e15, ×1000 ≪ 2^63) and
    * NTZ→TIMESTAMP is identity under the session's fixed UTC timezone —
    * matching DuckDB's `epoch_us(ts)` on the same naive values.
    * Works on streaming DataFrames too (plain projection, no shuffle).
    */
  def withNanosTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) | None => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
