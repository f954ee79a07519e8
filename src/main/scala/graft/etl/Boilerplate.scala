package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Source-level boilerplate detection (C4/CCNet-style template
  * removal): a 5-gram that recurs across ≥30% of a source's documents
  * is a TEMPLATE gram (nav bars, footers, license blurbs — the text
  * that repeats per SITE, not per document), distinct from corpus-wide
  * duplication ([[CorpusStats.dupNgramRate]] measures cross-doc
  * duplication with no site structure; reference analog: the
  * extractor's chrome-stripping rules, extractor.md:214-231, which cut
  * nav/footer noise per page — this is the corpus-statistical version).
  *
  * Determinism: the threshold is exact integer arithmetic
  * (10·df ≥ 3·n_docs); all shares in integer basis points.
  *
  * Scale posture: gram doc-frequency is a (source, gram)-keyed hash agg
  * (map-side combined, high-cardinality key); the per-source doc count
  * (|sources| rows) broadcasts; the strip pass joins grams back to the
  * boiler set on the same (source, gram) key — co-partitioned with the
  * agg that produced it, so AQE reuses the exchange. No all-pairs
  * stage anywhere; 100× data only widens the gram agg.
  */
object Boilerplate {

  /** (doc_id, source, gram) — one row per 5-gram position. */
  private def grams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      explode(Shingles.shingleArray(col("text"), 5)).as("gram"))

  /** Per-source docs + the (source, gram) doc-frequency frame. */
  private def docFreq(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val sd = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val df = grams(spark, dir)
      .groupBy(col("source"), col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("occ"))
    (sd, df)
  }

  /** Per-source template profile: how much of the source's 5-gram
    * traffic is boilerplate (distinct grams and occurrence mass).
    */
  def boilerplateNgrams(spark: SparkSession, dir: String): DataFrame = {
    val (sd, df) = docFreq(spark, dir)
    df.join(broadcast(sd), Seq("source"))
      .withColumn("is_boiler",
        when(col("df") * 10 >= col("n_docs") * 3, 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_grams"),
        sum(col("is_boiler")).as("n_boiler"),
        sum(col("occ")).as("n_occ"),
        expr("(10000 * sum(CASE WHEN is_boiler = 1 THEN occ ELSE 0 END)) div sum(occ)")
          .as("boiler_occ_bp"))
      .orderBy("source")
  }

  /** Per-document strip audit: the share of each doc's 5-gram
    * positions covered by its source's boilerplate grams — the mass a
    * template-stripping pass would remove (docs under 5 words carry no
    * grams and are absent, identically in both engines).
    */
  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    val (sd, df) = docFreq(spark, dir)
    val boiler = df.join(broadcast(sd), Seq("source"))
      .filter(col("df") * 10 >= col("n_docs") * 3)
      .select(col("source"), col("gram"), lit(1L).as("bflag"))
    grams(spark, dir)
      .join(boiler, Seq("source", "gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pos"),
        sum(coalesce(col("bflag"), lit(0L))).as("n_boiler_pos"))
      .withColumn("boiler_bp", expr("(10000 * n_boiler_pos) div n_pos"))
      .orderBy("doc_id")
  }
}
