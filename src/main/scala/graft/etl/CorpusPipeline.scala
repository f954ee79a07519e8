package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-corpus build — the LLM-data flow the north-star
  * operators exist for, composed into one run:
  *
  *   documents → quality gate → per-source domain cap → exact dedup
  *   → near-dup canonicalization
  *   (LSH → connected components → best-copy survivor) → duplicated-
  *   span clipping → character-entropy floor → per-language mix
  *   rebalance → RAG chunking → chunked corpus + build report
  *
  * Every stage is an already-oracle-verified operator applied to the
  * previous stage's survivors; the composition adds wiring, not new
  * semantics (reference analog: commands/transform.md:92-155 composes
  * extract → score → chunk the same way; the mix/dedup stages are the
  * builder brief's training-data extensions). All sampling/dedup
  * decisions are salted-hash or struct-min deterministic — two runs on
  * the same input produce byte-identical corpora.
  *
  * Scale notes: the stage chain is linear in the corpus with the LSH
  * candidate graph quadratic only inside buckets (minhashLshFrom), the
  * component fixpoint localCheckpoint'ed per round
  * (dedupComponentsFrom), and the chunker a pure generator. Per-stage
  * counts are one driver-side scalar per stage (the build report —
  * same discipline as Pipeline.run's artifacts).
  */
object CorpusPipeline {

  val QualityFloorBp = 3000   // keep docs scoring ≥ 30%
  val DomainCapDocs = 20      // RefinedWeb-style per-source cap (best first)
  val ChunkSize = 1000        // config/limits.yaml:166-170
  val ChunkOverlap = 100
  val MinCleanWords = 20      // span clip may not hollow a doc out
  val EntropyFloor = 2.0      // nats; degenerate repetition gate

  /** Runs the build; writes `chunks/` (partitioned by lang) and
    * `report/` under `outDir`, returns the 1-row build report.
    */
  def build(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val nInput = docs.count()

    // 1. quality gate (same basis-point score as the quality_score query)
    val kept1 = docs.join(
      TextAnalysis.qualityFrom(docs)
        .filter(col("quality_bp") >= QualityFloorBp).select("doc_id"),
      Seq("doc_id"))
    val nQuality = kept1.count()

    // 1b. per-source domain cap (round 6): keep at most DomainCapDocs
    //     best-quality docs per source so no domain dominates the mix
    //     (the domain_cap query's GroupTopK-able rank<=k shape)
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality_bp").desc, col("doc_id").asc)
    val capped = kept1
      .join(TextAnalysis.qualityFrom(docs).select("doc_id", "quality_bp"),
        Seq("doc_id"))
      .withColumn("src_rank", org.apache.spark.sql.functions.row_number().over(wSrc))
      .filter(col("src_rank") <= DomainCapDocs)
      .drop("quality_bp", "src_rank")
    val nDomCap = capped.count()

    // 2. exact dedup: one survivor per distinct text (min doc_id)
    val kept2 = capped.join(
      Dedup.dedupExactFrom(capped).select(col("canonical_doc").as("doc_id")),
      Seq("doc_id"))
    val nExact = kept2.count()

    // 3. near-dup canonicalization: LSH candidates → connected
    //    components → best copy per cluster (longest text, id tie-break)
    val comp = Dedup.dedupComponentsFrom(
      Dedup.minhashLshFrom(kept2.select(col("doc_id"), col("text"))))
    val keepers = comp
      .join(kept2.select(col("doc_id"), length(col("text")).as("len")), Seq("doc_id"))
      .groupBy(col("component"))
      .agg(max(struct(col("len"), (-col("doc_id")).as("nid"))).as("m"))
      .select((-col("m.nid")).as("doc_id"))
    val clustered = comp.select("doc_id")
    val kept3 = kept2.join(clustered, Seq("doc_id"), "left_anti")
      .unionByName(kept2.join(keepers, Seq("doc_id")))
    val nNearDup = kept3.count()

    // 3b. span clipping (round 6): remove cross-survivor duplicated
    //     8-gram spans from the texts themselves (Lee et al. clip, not
    //     drop), then drop documents the clip hollowed out
    val clipped = Dedup.spanClipFrom(kept3.select(col("doc_id"), col("text")))
      .filter(col("n_words") - col("n_removed") >= MinCleanWords)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(kept3.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val nClipped = clipped.count()

    // 3c. character-entropy floor (round 6): a clip can leave
    //     degenerate repetition that word stats miss
    val kept4 = clipped.join(
      TextAnalysis.charEntropyFrom(clipped)
        .filter(col("entropy") >= EntropyFloor).select("doc_id"),
      Seq("doc_id"))
    val nEntropy = kept4.count()

    // 4. per-language mix rebalance toward a uniform budget (the
    //    mix_weights rates driving a salted-hash bucket cut)
    val toks = kept4
      .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("t"))
      .groupBy(col("lang")).agg(sum(col("t")).as("n_tokens"))
    val tot = toks.agg(sum(col("n_tokens")).as("total"), count(lit(1)).as("n_langs"))
    val rates = toks.crossJoin(broadcast(tot))
      .select(col("lang"),
        least(lit(10000L),
          expr("(10000 * (total div n_langs)) div n_tokens")).as("rate_bp"))
    val sampled = kept4.join(broadcast(rates), Seq("lang"))
      .filter(Splits.hashBucket(col("doc_id"), "mix:") * lit(100) < col("rate_bp"))
    val nSampled = sampled.count()

    // 5. RAG chunking (reference chunk_size/overlap limits)
    val chunks = Chunker.chunk(sampled, col("text"), ChunkSize, ChunkOverlap)
      .select(col("doc_id"), col("lang"), col("chunk_idx"), col("chunk"))
    chunks.write.mode("overwrite").partitionBy("lang").parquet(s"$outDir/chunks")
    val written = spark.read.parquet(s"$outDir/chunks")
    val nChunks = written.count()

    import spark.implicits._
    val report = Seq((nInput, nQuality, nDomCap, nExact, nNearDup, nClipped,
        nEntropy, nSampled, nChunks))
      .toDF("n_input", "n_quality", "n_domcap", "n_exact", "n_neardup",
        "n_clipped", "n_entropy", "n_sampled", "n_chunks")
    report.write.mode("overwrite").parquet(s"$outDir/report")
    report
  }
}
