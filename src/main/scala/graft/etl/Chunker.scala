package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** G1: RAG chunker — the reference's one generator (one row → many rows)
  * op (output-transformer.md:297-330; config/limits.yaml:166-170):
  * fixed-size chunks with overlap, ≤ maxChunks per document.
  *
  * Implemented as a declarative generator: `sequence()` of chunk starts +
  * `posexplode` + `substring`. Stays inside whole-stage codegen (no UDF,
  * no typed flatMap) and therefore scales as a pure map — no shuffle at
  * all: chunking 100 TB of documents is embarrassingly parallel.
  *
  * The reference's heading-aware / code-block-whole variants are handled
  * by [[Chunker.chunkMarkdown]] (splits on heading boundaries first);
  * the size/overlap math is common to both.
  */
object Chunker {

  /** Chunk-start offsets: 0, step, 2*step, ... < len (step = size-overlap),
    * capped at maxChunks. Empty/short docs yield exactly one chunk.
    */
  def chunkStarts(len: Column, size: Int, overlap: Int, maxChunks: Int): Column = {
    val step = size - overlap
    require(step > 0, "chunk size must exceed overlap")
    val nRaw = ceil((greatest(len, lit(1)).cast("double") - lit(overlap)) / lit(step))
      .cast("int")
    val n = least(greatest(nRaw, lit(1)), lit(maxChunks))
    sequence(lit(0), (n - 1) * step, lit(step))
  }

  /** Explode a text column into (chunk_idx, chunk) rows. */
  def chunk(df: DataFrame, text: Column, size: Int, overlap: Int,
      maxChunks: Int = 50): DataFrame = {
    val t = coalesce(text, lit(""))
    df.withColumn("__len", length(t))
      .select(col("*"),
        posexplode(chunkStarts(col("__len"), size, overlap, maxChunks)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumn("chunk", t.substr(col("col") + 1, lit(size)))
      .drop("col", "__len")
  }

  /** Heading-aware split: markdown is cut at H1-H3 boundaries first, then
    * each section is size-chunked. Sections arrive via split on a
    * lookahead-free sentinel replace (Java and RE2 share no lookahead).
    */
  def chunkMarkdown(df: DataFrame, text: Column, size: Int, overlap: Int): DataFrame = {
    val sectioned = regexp_replace(coalesce(text, lit("")),
      "(?m)^(#{1,3} )", "$1")
    val sections = df.withColumn("section",
        explode(filter(split(sectioned, ""), s => length(s) > 0)))
    chunk(sections, col("section"), size, overlap)
  }

  /** G1 code-blocks-kept-whole rule (output-transformer.md:316-318):
    * fenced code blocks are NEVER split across chunks. The document is
    * cut at ``` fences into alternating prose/code segments (odd segment
    * index = inside a fence, assuming balanced fences); prose segments
    * get the normal size/overlap chunking, code segments are emitted as
    * exactly one chunk with the fences restored, whatever their length.
    * Single pass — the conditional chunk-start array keeps one explode,
    * no union/rescan — so it remains a pure shuffle-free map like
    * [[chunk]].
    */
  def chunkCodeAware(df: DataFrame, text: Column, size: Int, overlap: Int,
      maxChunks: Int = 50): DataFrame = {
    val t = coalesce(text, lit(""))
    df.select(col("*"), posexplode(split(t, "```")))
      .withColumnRenamed("pos", "seg_idx")
      .withColumnRenamed("col", "seg")
      .withColumn("is_code", col("seg_idx") % 2 === 1)
      .withColumn("starts",
        when(col("is_code"), array(lit(0)))
          .otherwise(chunkStarts(length(col("seg")), size, overlap, maxChunks)))
      .select(col("*"), posexplode(col("starts")))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumn("chunk",
        when(col("is_code"), concat(lit("```"), col("seg"), lit("```")))
          .otherwise(col("seg").substr(col("col") + 1, lit(size))))
      .drop("col", "starts", "seg")
  }

  /** Verified query for the code-aware chunker. `documents.text` has no
    * fences, so a deterministic markdown shell embeds one fenced block of
    * real corpus text per document (same construction in the DuckDB
    * oracle); prose spans longer than `size` prove the split math, the
    * fenced span proves atomicity.
    */
  def codeChunk(spark: SparkSession, dir: String): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    val md = concat(
      substring(t, 1, 150), lit("\n```\n"),
      substring(t, 151, 80), lit("\n```\n"),
      substring(t, 231, 1000000))
    chunkCodeAware(
      Tables.documents(spark, dir).select(col("doc_id"), md.as("md")),
      col("md"), size = 100, overlap = 20)
      .select(col("doc_id"), col("seg_idx"), col("chunk_idx"), col("is_code"),
        col("chunk"), length(col("chunk")).as("chunk_len"))
      .orderBy("doc_id", "seg_idx", "chunk_idx")
  }

  /** SQL-surface twin: the chunk_text GENERATOR through actual SQL text
    * (LATERAL VIEW), proving the registered function end to end.
    */
  def sqlChunk(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("graft_documents")
    spark.sql(
      """SELECT doc_id, c.chunk_idx, c.chunk, length(c.chunk) AS chunk_len
        |FROM graft_documents
        |LATERAL VIEW chunk_text(text, 150, 30) c AS chunk_idx, chunk
        |ORDER BY doc_id, chunk_idx""".stripMargin)
  }

  /** Verified query: documents chunked at (size=120, overlap=20) — sized
    * to the synthetic corpus body lengths; the 500/1000/100 production
    * parameters are the same math (config/limits.yaml:166-170).
    */
  def ragChunk(spark: SparkSession, dir: String): DataFrame =
    chunk(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        col("text"), size = 120, overlap = 20)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        length(col("chunk")).as("chunk_len"))
      .orderBy("doc_id", "chunk_idx")

  /** Token-budget chunking — the LLM-training flavor of G1: each
    * document is cut into chunks of at most `TokenBudget` WHITESPACE
    * TOKENS (not characters), so every chunk fits a model context
    * regardless of word length. The per-doc chunk list is built
    * INSIDE the token array (transform ∘ sequence ∘ slice) and only
    * then exploded — a single scan with zero shuffles (the exploded
    * groupBy formulation would exchange every token row; PlanSpec
    * pins the shape). `toks` is materialized as a column before the
    * lambda so the HOF references a bound attribute, not a
    * re-evaluated expression (the O(n²) trap in CLAUDE.md).
    */
  val TokenBudget = 64

  def tokenChunk(spark: SparkSession, dir: String): DataFrame = {
    val b = TokenBudget
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        filter(split(coalesce(col("text"), lit("")), " "),
          w => length(w) > 0).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"),
        posexplode(transform(
          sequence(lit(0), expr(s"(n - 1) div $b")),
          i => array_join(slice(col("toks"), i * b + 1, lit(b)), " "))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        least(lit(b), col("n") - col("pos") * b).cast("int")
          .as("n_chunk_tokens"),
        col("col").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }
}
