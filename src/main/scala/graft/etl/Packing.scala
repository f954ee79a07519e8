package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-sequence packing — the step between a cleaned corpus and a
  * token-budget training run: documents are concatenated shard-by-shard
  * and cut into fixed-size sequences ("concat-and-split" packing, the
  * layout GPT-style pretraining consumes). Each document's span of
  * packed sequences is a pure function of the running token count
  * inside its shard, so the whole computation is one shard-partitioned
  * window — no global ordering, no single-partition exchange, no
  * driver loop.
  *
  * Scale posture: the shard column IS the parallelism unit. At 100 TB
  * you shard by (source, date-bucket) to thousands of shards; each
  * shard's prefix sum runs independently after one shuffle on the
  * shard key. This is the batch_pack_sharded discipline applied to
  * token budgets (reference analog: the transformer's batch planner,
  * DESIGN.md:729-764, re-expressed for token-count packing).
  */
object Packing {

  /** Tokens per packed training sequence. Toy-scale on purpose (real
    * runs use 2k-8k); the plan shape is budget-independent.
    */
  val SeqTokens = 512

  /** Shard count for the bench corpus. Production: O(thousands),
    * keyed by natural partitions (source/day), not doc_id arithmetic.
    */
  val Shards = 8

  /** Per-document packed-sequence spans: which training sequences
    * (bins) of its shard each document's tokens land in. A document
    * crossing a bin boundary is SPLIT across sequences (the
    * concat-and-split contract — no padding waste, boundary docs are
    * bisected); `n_bins` > 1 marks those.
    *
    * Deterministic: shard = doc_id % Shards, order within shard =
    * doc_id, so the packing is reproducible under any partitioning.
    * All math is integer (token counts, prefix sums, `div`) — exact
    * on both engines.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        (col("doc_id") % Shards).cast("int").as("shard"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("start_bin", expr(s"(cum - n_tokens) div $SeqTokens"))
      .withColumn("end_bin", expr(s"(cum - 1) div $SeqTokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("start_bin"), col("end_bin"),
        (col("end_bin") - col("start_bin") + 1).as("n_bins"))
      .orderBy("doc_id")
  }

  /** Length-grouped batching — the OTHER packing discipline: when
    * documents must stay whole (fine-tuning, eval), batches pad every
    * member to the batch max, and padding waste is minimized by
    * batching SIMILAR lengths together. Documents are banded by
    * token-length bucket (16-token bands), ordered within the band,
    * and cut into fixed-count batches; the report prices each batch's
    * padding overhead in basis points — the number a data engineer
    * reads to pick band width.
    *
    * Scale posture: the only window is partitioned by the length
    * band — bounded, parallel; no global ordering. At 100 TB the band
    * key gains a salt (band, hash div N) exactly like
    * [[packSequences]]'s shards; waste accounting is unchanged.
    */
  val BatchDocs = 8

  def paddingBatches(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("band", expr("n_tokens div 16"))
    val w = Window.partitionBy(col("band")).orderBy(col("doc_id"))
    docs
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", expr(s"(rn - 1) div $BatchDocs"))
      .groupBy(col("band"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padded_tokens", col("max_tokens") * col("n_docs"))
      .withColumn("waste_bp",
        expr("(10000 * (padded_tokens - sum_tokens)) div padded_tokens"))
      .orderBy("band", "batch_id")
  }

  /** Curriculum ordering with domain interleave — easy-to-hard tiers
    * (Bengio et al. 2009 "Curriculum Learning") where each tier
    * round-robins across languages, so no training window sees a
    * single-domain run (the distribution-shift failure curricula are
    * known for). The order is a pair of COLUMNS, (tier, ikey) with
    * ikey = (round-1)·L + lang_idx: round r of the interleave emits one
    * doc per surviving language in lang order. Unequal language counts
    * leave key gaps, never order violations — consumers zip a dense
    * index at materialization.
    *
    * Scale posture: the only table-sized operations are one
    * (tier, lang)-partitioned window and broadcast joins against a
    * language dim derived WITHOUT a global window — lang_idx comes from
    * a tiny dim self-join (count of smaller langs), because ranking
    * even a 5-row dim with row_number() would plan the SinglePartition
    * exchange the PlanSpec sweep bans. The same trick seeds
    * page_id_gen's shard offsets.
    */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr("CAST(least(3, n_chars div 150) AS BIGINT)").as("tier"))
    val langs = docs.select(col("lang")).distinct()
    val idx = langs.as("a")
      .join(langs.as("b"), col("b.lang") < col("a.lang"), "left")
      .groupBy(col("a.lang").as("lang"))
      .agg(count(col("b.lang")).as("lang_idx"))
    val nl = langs.agg(count(lit(1)).as("nl"))
    val w = Window.partitionBy(col("tier"), col("lang")).orderBy(col("doc_id"))
    docs
      .withColumn("round", row_number().over(w))
      .join(broadcast(idx), Seq("lang"))
      .crossJoin(broadcast(nl))
      .withColumn("ikey",
        ((col("round") - 1).cast("bigint") * col("nl") + col("lang_idx"))
          .cast("bigint"))
      .select(col("doc_id"), col("tier"), col("lang"), col("round"), col("ikey"))
      .orderBy("tier", "ikey")
  }
}
