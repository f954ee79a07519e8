package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.BoundedConcat

/** Bounded hierarchical summarization queries built on the custom
  * BoundedConcat Aggregator (SURVEY.md §2.12 — the reference's summary
  * pyramid, DESIGN.md:153-195, with the IRON RULE as a type-level
  * guarantee: no buffer ever exceeds the char budget).
  */
object Summaries {

  val SummaryCap = 200

  /** Per-language bounded digest: first-30-chars of each doc, joined in
    * doc_id order, capped at 200 chars. The Aggregator's merge-order
    * independence is what makes this oracle-checkable at all.
    */
  def boundedSummary(spark: SparkSession, dir: String): DataFrame = {
    val bc = udaf(BoundedConcat(SummaryCap))
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        substring(coalesce(col("text"), lit("")), 1, 30).as("piece"))
      .groupBy(col("lang"))
      .agg(bc(col("doc_id"), col("piece")).as("summary"))
      .select(col("lang"), col("summary"),
        length(col("summary")).as("summary_len"),
        size(split(col("summary"), "\\|")).as("n_pieces"))
      .orderBy("lang")
  }
}
