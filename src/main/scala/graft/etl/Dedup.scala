package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication family for the training-data pipeline (builder brief):
  * exact, MinHash+LSH, n-gram Jaccard, SimHash. Everything is expressed
  * as joins/aggregations over shingle rows so it distributes: no
  * pairwise O(n²) work outside LSH buckets / bounded candidate sets.
  *
  * Hashing is md5-based (not Spark's murmur3 `hash()`): md5 is bit-
  * identical in DuckDB, which keeps the whole family oracle-checkable.
  * At production scale you'd swap in xxhash64 for speed — the plan
  * shape (explode → min-agg → band → self-join) is unchanged.
  */
object Dedup {

  /** Exact dedup by content hash: canonical (min) doc id per distinct
    * text + duplicate count. groupBy on the hash = one shuffle keyed by
    * digest — the standard 100 TB exact-dedup plan.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("text_hash", md5(coalesce(col("text"), lit(""))))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("canonical_doc"),
        count(lit(1)).as("n_dups"))
      .filter(col("n_dups") >= 2)
      .orderBy("text_hash")

  /** MinHash signatures: NumHashes independent min-hashes per doc, hash_i
    * = min over shingles of md5(seed_i || shingle). Docs with <3 words
    * have no shingles and are excluded (can't near-dup match).
    */
  val NumHashes = 8
  val BandSize = 2 // → 4 bands

  def minhashSignature(shingled: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map { i =>
      min(md5(concat(lit(s"seed$i:"), col("shingle")))).as(s"mh_$i")
    }
    shingled.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  def minhashSignatureQuery(spark: SparkSession, dir: String): DataFrame =
    minhashSignature(Shingles.wordShingles(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")), 3))
      .select(col("doc_id"), col("mh_0"), col("mh_1"), col("mh_7"))
      .orderBy("doc_id")

  /** LSH banding: a band key = md5 of its BandSize signature slots;
    * candidate pairs = docs sharing any band key (distinct a<b pairs).
    * The self-join is per-bucket — the O(n²) blowup only happens inside
    * a bucket, which is the entire point of LSH at scale.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignature(Shingles.wordShingles(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")), 3))
    val bandCols = (0 until NumHashes / BandSize).map { b =>
      val slots = (0 until BandSize).map(i => col(s"mh_${b * BandSize + i}"))
      struct(lit(b).as("band"), md5(concat_ws("|", slots: _*)).as("bkey"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    pairs.orderBy("doc_a", "doc_b")
  }

  /** n-gram Jaccard similarity on a bounded candidate block (doc_id < 64
    * on both sides — fixed-size regardless of SF; production pairing
    * comes from minhashLsh candidates instead).
    * |A∩B| via join on distinct shingles, |A∪B| = |A|+|B|-|A∩B|.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") < 64).select(col("doc_id"), col("text"))
    val sh = Shingles.wordShingles(docs, 3)
      .select(col("doc_id"), col("shingle")).distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("n_union", col("sa.n_sh") + col("sb.n_sh") - col("n_common"))
      // basis points via integer div: exact in both engines (rational
      // similarity values sit exactly on decimal rounding boundaries)
      .withColumn("jaccard_bp", expr("(10000 * n_common) div n_union"))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard_bp"))
      .filter(col("jaccard_bp") >= 1000)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash (16-bit): per word, a 16-bit hash from the md5 hex prefix;
    * bit b contributes +1/-1 by parity; the signature bit is the sign of
    * the sum. Hex→int via conv() is oracle-reproducible (DuckDB
    * CAST('0x…')). One explode + one groupBy — linear, shuffle on doc_id.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val words = Shingles.words(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))
    val h16 = conv(substring(md5(col("word")), 1, 4), 16, 10).cast("int")
    val withHash = words.withColumn("h", h16)
    val bitAggs = (0 until 16).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$b")
    }
    val sums = withHash.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until 16).map { b =>
      when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col("doc_id"), sig.cast("bigint").as("simhash16"))
      .orderBy("doc_id")
  }
}
