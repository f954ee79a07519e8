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

  /** A3's EXTRACTIVE tier, oracle-checked — the image_describe honesty
    * move applied to summarization (reference extractor.md:334-374,
    * DESIGN.md:153-195): everything a rules tier can say about a
    * document's content ships as verified columns, and ONLY the
    * model-generated abstractive prose stays behind the declared
    * enrichment boundary ([[summarizeEnriched]]). The extractive
    * policy is the standard centroid heuristic made engine-exact:
    * split the document into 40-word passages, score each passage by
    * its occurrences of the document's top-3 TF keywords, keep the 2
    * highest-scoring passages REASSEMBLED IN DOCUMENT ORDER (the
    * extract-don't-reorder rule), joined with " ... ". Every step is
    * integer/string arithmetic both engines reproduce bit-for-bit.
    *
    * Scale posture: ONE tokenize staged for its three readers (tf →
    * keyword top-3 on the native GroupTopK heap, passage build, score
    * join); passages aggregate on (doc_id, cidx) — map-side combined,
    * key-partitioned; the keyword frame is doc-keyed (a keyed join,
    * NOT a broadcast — it is corpus-sized at 100 TB); the top-2 cut
    * rides GroupTopK, never a corpus window.
    */
  def extractiveSummary(spark: SparkSession, dir: String): DataFrame = {
    val locals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      val w = Fixpoint.locally(
        Shingles.words(Tables.documents(spark, dir)
            .select(col("doc_id"), col("text")))
          .withColumn("cidx", expr("word_pos div 40")), locals)
      val tf = w.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      val k3 = Fixpoint.locally(graft.plans.GroupTopK.topK(tf, Seq("doc_id"),
        Seq(("c", false), ("word", true)), 3)
        .select(col("doc_id"), col("word")), locals)
      val kw = k3.groupBy(col("doc_id")).agg(collect_list(col("word")).as("kw"))
      // passage text and keyword score are built as SEPARATE aggregates
      // of the token frame: the first form joined each doc's keyword
      // ARRAY onto every word row before the chunk agg — measured
      // 30.6 s at 30× from shipping a 3-string array per token through
      // the shuffle; scoring through the (doc_id, word)-keyed k3 join
      // keeps the shuffle rows scalar (10.6 s at 30×, same results)
      val chunks = w.groupBy(col("doc_id"), col("cidx"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("word_pos"), col("word")))),
          s => s("word")), " ").as("chunk"))
      val scores = w.join(k3, Seq("doc_id", "word"))
        .groupBy(col("doc_id"), col("cidx")).agg(count(lit(1)).as("s"))
      val ch = Fixpoint.locally(chunks
        .join(scores, Seq("doc_id", "cidx"), "left")
        .withColumn("score", coalesce(col("s"), lit(0L)))
        .select(col("doc_id"), col("cidx"), col("chunk"), col("score")),
        locals)
      val kept = graft.plans.GroupTopK.topK(ch, Seq("doc_id"),
          Seq(("score", false), ("cidx", true)), 2)
      val summary = kept.groupBy(col("doc_id"))
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("cidx"), col("chunk")))),
            s => s("chunk")), " ... ").as("summary"),
          count(lit(1)).as("n_kept"),
          max(col("score")).as("top_score"))
      val totals = ch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      Fixpoint.reliably(totals
        .join(summary, Seq("doc_id"))
        .join(kw.select(col("doc_id"),
          array_join(array_sort(col("kw")), ",").as("keywords")), Seq("doc_id"))
        .select(col("doc_id"), col("keywords"), col("n_chunks"),
          col("n_kept"), col("top_score"), col("summary"))
        .orderBy("doc_id"))
    } finally Fixpoint.releaseAll(locals)
  }

  /** A3's ENRICHMENT BOUNDARY made executable — [[extractiveSummary]]'s
    * analog of [[Multimodal.describeEnriched]]: production composes the
    * verified extractive frame with model-generated abstractive prose
    * by APPENDING columns through this hook (`model` maps the verified
    * columns to the prose Column; a deployment batches a
    * summarization endpoint, tests use a deterministic stub). The
    * verified columns pass through untouched; the composition is
    * map-side; `full_summary` = abstractive prose + " — " + extract,
    * the reference's summary-plus-evidence layout.
    */
  def summarizeEnriched(spark: SparkSession, dir: String,
      model: DataFrame => org.apache.spark.sql.Column): DataFrame = {
    val base = extractiveSummary(spark, dir)
    base.withColumn("model_prose", model(base))
      .withColumn("full_summary",
        concat(col("model_prose"), lit(" — "), col("summary")))
  }

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
