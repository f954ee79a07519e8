package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Exact dedup by content hash: the full canonical mapping — one row
    * per distinct text with its keeper (min doc id) and multiplicity.
    * groupBy on the digest = one shuffle keyed by hash — the standard
    * 100 TB exact-dedup plan (filter n_copies >= 2 for just the dups).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    dedupExactFrom(Tables.documents(spark, dir))

  def dedupExactFrom(docs: DataFrame): DataFrame =
    docs
      .withColumn("text_hash", md5(coalesce(col("text"), lit(""))))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("canonical_doc"),
        count(lit(1)).as("n_copies"))
      .orderBy("text_hash")

  /** Order-invariant exact dedup: the fingerprint is the SORTED word
    * multiset, so documents that differ only by word order — shuffled
    * boilerplate, re-ordered list pages, template rotations — collapse
    * onto one group that [[dedupExact]]'s raw-text hash cannot see
    * (bag-of-words canonicalization; supersets every raw-hash group by
    * construction). Output is the per-doc verdict: group fingerprint,
    * multiplicity, keeper (min doc id), and whether this row survives.
    *
    * Scale posture: canonicalization happens inside the word ARRAY
    * (sort + join, a pure map in the scan stage); then one hash-keyed
    * agg and one hash-keyed join-back — the exact-dedup plan with a
    * sort-normalized key.
    */
  def bagDedup(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(array_join(array_sort(Shingles.wordArray(col("text"))), " "))
          .as("bag_fp"))
    val grp = fp.groupBy(col("bag_fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical"))
    fp.join(grp, Seq("bag_fp"))
      .select(col("doc_id"), col("bag_fp"), col("n_docs"), col("canonical"),
        (col("doc_id") === col("canonical")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** MinHash signatures: numHashes independent min-hashes per doc, hash_i
    * = min over shingles of md5(seed_i || shingle). Computed inside the
    * shingle ARRAY (array_min ∘ transform) — a pure map, no explode, no
    * shuffle; signature extraction over 100 TB is a single scan. Docs
    * with <3 words have no shingles and are excluded (can't near-dup
    * match).
    *
    * Parameters trade recall for cost on the standard s-curve
    * P(candidate | jaccard=s) = 1 − (1 − s^r)^(n/r), r = bandSize (see
    * [[candidateProbability]]); the (r/n)^(1/r) rule of thumb estimates
    * the 50% point. [[TestNumHashes]]/[[TestBandSize]] (8/2 → exact 50%
    * point s ≈ 0.40; the rule of thumb says 0.50) keep the oracle
    * corpus productive; [[ProdNumHashes]]/[[ProdBandSize]] (128/4 →
    * 32 bands, exact 50% point s ≈ 0.38 with a much sharper curve) is
    * the documented production preset — same plan shape, just more
    * signature columns.
    */
  val TestNumHashes = 8
  val TestBandSize = 2 // → 4 bands
  val ProdNumHashes = 128
  val ProdBandSize = 4 // → 32 bands

  /** Exact probability that two docs with Jaccard similarity `s` share
    * at least one LSH band (the banding s-curve). Pure math — the unit
    * test pins monotonicity and the threshold location so parameter
    * changes are conscious recall decisions, not accidents.
    */
  def candidateProbability(s: Double, numHashes: Int, bandSize: Int): Double = {
    require(numHashes % bandSize == 0, "bands must tile the signature")
    val bands = numHashes / bandSize
    1.0 - math.pow(1.0 - math.pow(s, bandSize.toDouble), bands.toDouble)
  }

  /** docs(doc_id, text) → (doc_id, mh_0..mh_{n-1}), shuffle-free.
    * The shingle array is materialized once behind the size filter
    * (Project-Filter-Project is not collapsed by Catalyst), so the n
    * hash columns read a computed attribute instead of re-deriving the
    * array n times.
    */
  def minhashSignature(docs: DataFrame,
      numHashes: Int = TestNumHashes): DataFrame =
    minhashSignatureWith(docs, numHashes,
      sh => graft.functions.ShingleFunctions.minhashF(sh, numHashes))

  /** Shared signature core — ONE implementation for both hash tiers,
    * parametrized ONLY by the seeded signature kernel. The md5
    * instantiation is DuckDB-oracle-verified end to end, and because
    * the fast tier runs this same machinery with just the kernel
    * swapped, the oracle structurally covers everything except the
    * hash primitive itself.
    *
    * Round 18: the kernel is ONE compiled pass
    * ([[graft.functions.MinHashSigs]]) producing all numHashes min
    * slots at once — the per-slot array_min(transform(...)) chain it
    * replaces ran numHashes interpreted passes over the shingle array
    * (HOFs are CodegenFallback). Values bit-identical; the mh_i
    * columns are element_at projections of the signature array, kept
    * behind the size filter so the signature evaluates once (the
    * CollapseProject multi-reference guard, as before).
    */
  private def minhashSignatureWith(docs: DataFrame, numHashes: Int,
      sigs: Column => Column): DataFrame = {
    val cols = (0 until numHashes).map { i =>
      element_at(col("__sig"), i + 1).as(s"mh_$i")
    }
    docs.select(col("doc_id"), Shingles.shingleArray(col("text"), 3).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"), sigs(col("__sh")).as("__sig"))
      .select(col("doc_id") +: cols: _*)
  }

  def minhashSignatureQuery(spark: SparkSession, dir: String): DataFrame =
    minhashSignature(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("mh_0"), col("mh_1"), col("mh_7"))
      .orderBy("doc_id")

  /** PRODUCTION-SPEED signatures: THE SAME [[minhashSignatureWith]]
    * machinery as [[minhashSignature]] with xxhash64 (codegen'd native
    * longs) plugged in for md5 (MessageDigest + hex strings). md5
    * exists only because the DuckDB oracle can reproduce it
    * bit-for-bit; xxhash64 (like every fast 64-bit family — murmur3,
    * crc-combining) has NO DuckDB twin, so a direct value oracle for
    * this tier is impossible — see the impossibility note in
    * [[graft.Oracles]]' scaladoc. Verification is therefore layered:
    * (1) the shared core is oracle-verified through its md5
    * instantiation (only the hash primitive differs, and that is a
    * Spark built-in), and (2) InvariantSpec cross-checks the
    * composition in-engine: both LSH tiers recover every
    * exact-duplicate pair (identical shingle sets ⇒ identical
    * signatures under ANY hash ⇒ recall-1 candidates).
    */
  def minhashSignatureFast(docs: DataFrame,
      numHashes: Int = TestNumHashes): DataFrame =
    minhashSignatureWith(docs, numHashes,
      sh => graft.functions.ShingleFunctions.minhashFastF(sh, numHashes))

  /** Error-band audit of the fast tier (Oracles.scala error-band
    * note): xxhash64 signature VALUES are not DuckDB-recomputable, but
    * the Jaccard similarity a MinHash signature ESTIMATES is. So the
    * query emits, per intersecting pair of the bounded block, the
    * exact shingle-set Jaccard (basis points, same ground truth as
    * [[ngramJaccard]]) plus `est_ok`: the k=256-slot fast-signature
    * match fraction lands within 2500 bp of the truth. Hoeffding at
    * k=256, b=0.25 puts a single pair's violation odds at
    * 2·exp(−2·256·0.0625) ≈ 2e−14 — deterministic in practice for any
    * driver-regenerated corpus, while still pinning the estimator to
    * the quantity it estimates. The flag is computed in-engine; the
    * oracle recomputes the exact side and asserts TRUE.
    */
  def minhashFastQuery(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val block = Tables.documents(spark, dir)
      .filter(col("doc_id") < 64).select(col("doc_id"), col("text"))
    val sig = minhashSignatureFast(block, k)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"mh_$i")): _*).as("sig"))
    pairJaccardFrom(block)
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        Seq("doc_b"))
      .withColumn("__matches",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), m => m)).cast("bigint"))
      .withColumn("est_ok",
        expr(s"abs((10000 * __matches) div $k - jaccard_bp) <= 2500"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("jaccard_bp"), col("est_ok"))
      .orderBy("doc_a", "doc_b")
  }

  /** LSH banding over the fast signatures — the same [[lshPairsWith]]
    * core as [[minhashLsh]]; band key = xxhash64 of the slots instead
    * of md5 (same verification layering as [[minhashSignatureFast]]).
    */
  def minhashLshFast(docs: DataFrame, numHashes: Int = TestNumHashes,
      bandSize: Int = TestBandSize): DataFrame =
    lshPairsWith(minhashSignatureFast(docs, numHashes), numHashes, bandSize,
      fastBandKey)

  /** (band, bkey) struct columns over the mh_* signature columns —
    * THE banding definition, shared by every site that bands (batch
    * pairing, incremental probe, bucket profile, both streaming
    * forms), so a band-layout change cannot silently break the
    * stream==batch parity or the bucket-stats cost model (round-14
    * self-review). `bandKey` is the per-tier hash: md5 for the
    * oracle-checkable tier, xxhash64 for the fast tier.
    */
  private[graft] def bandStructs(numHashes: Int, bandSize: Int,
      bandKey: Seq[Column] => Column): Seq[Column] = {
    require(numHashes % bandSize == 0, "bands must tile the signature")
    (0 until numHashes / bandSize).map { b =>
      val slots = (0 until bandSize).map(i => col(s"mh_${b * bandSize + i}"))
      struct(lit(b).as("band"), bandKey(slots).as("bkey"))
    }
  }

  /** md5 band key (oracle tier) / xxhash64 band key (fast tier). */
  private[graft] val md5BandKey: Seq[Column] => Column =
    slots => md5(concat_ws("|", slots: _*))
  private[graft] val fastBandKey: Seq[Column] => Column =
    slots => xxhash64(slots: _*)

  /** Shared banding core for both hash tiers: band key = `bandKey` of
    * the band's signature slots; candidate pairs = docs sharing any
    * band key (distinct a<b pairs). The self-join is per-bucket — the
    * O(n²) blowup only happens inside a bucket, which is the entire
    * point of LSH at scale. The banded table is materialized once
    * (reliable checkpoint — nothing pinned outlives the call) so both
    * sides of the self-join read it instead of re-deriving the
    * signature pipeline.
    */
  /** Banded candidate pairs. `saltThreshold` (default OFF) is the
    * round-15 skew hardening: a band bucket holding c > threshold docs
    * is one straggler task at 100 TB (its c² pair work lands on the
    * single reducer owning that join key). When enabled, hot buckets
    * split into k = ceil(c/threshold) salted sub-groups
    * (salt = xxhash64(doc_id) mod k — deterministic), and the join
    * covers within- AND cross-salt pairs by probing: the left side
    * emits one row per target salt in [own salt, k), the right side
    * keys on its own salt, so the join key (band, bkey, salt) spreads
    * the bucket over k reducers while the PAIR SET is provably
    * unchanged — a pair with salts a ≤ b is produced exactly once (by
    * the a-side probing b; same-salt pairs keep the doc_id < guard),
    * InvariantSpec-verified. Cold buckets keep k = 1 (left anti-ish:
    * the occupancy join is a left join against the hot slice only).
    * Cost: one extra (band, bkey)-keyed agg + left join; left-side
    * rows grow only by Σ_hot (k − salt) ≈ (3/2)·hot rows.
    */
  private def lshPairsWith(sig: DataFrame, numHashes: Int, bandSize: Int,
      bandKey: Seq[Column] => Column,
      saltThreshold: Int = Int.MaxValue): DataFrame = {
    val bandCols = bandStructs(numHashes, bandSize, bandKey)
    // banded table: fast local checkpoint read by both self-join sides;
    // the (small) pair OUTPUT goes to reliable storage, after which the
    // band blocks are released — zero pins, memory-speed staging
    val locals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val banded0 =
      sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    try {
      if (saltThreshold == Int.MaxValue) {
        val banded = Fixpoint.locally(banded0, locals)
        // round 19: the checkpointed pair frame is UNSORTED — the build
        // paid a full range exchange + sort for an order only the
        // declared minhash_lsh query surface needs ([[minhashLsh]] adds
        // it back on top; every other consumer aggregates, and
        // EliminateSorts would have dropped the order from their plans
        // anyway — guide §2.4: an orderBy used only to make output
        // deterministic is an accidental exchange)
        Fixpoint.reliably(banded.as("x").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct())
      } else {
        val staged = Fixpoint.locally(banded0, locals)
        val hot = staged.groupBy(col("band"), col("bkey"))
          .agg(count(lit(1)).as("c"))
          .filter(col("c") > saltThreshold)
        val salted = Fixpoint.locally(
          staged.join(hot, Seq("band", "bkey"), "left")
            .withColumn("k",
              coalesce(ceil(col("c") / saltThreshold).cast("int"), lit(1)))
            .withColumn("salt",
              pmod(xxhash64(col("doc_id")), col("k")).cast("int"))
            .select(col("doc_id"), col("band"), col("bkey"),
              col("k"), col("salt")), locals)
        val left = salted
          .withColumn("probe", explode(sequence(col("salt"), col("k") - 1)))
          .select(col("doc_id").as("doc_l"), col("band").as("bl"),
            col("bkey").as("kl"), col("salt").as("salt_l"), col("probe"))
        val right = salted.select(col("doc_id").as("doc_r"),
          col("band").as("br"), col("bkey").as("kr"), col("salt").as("salt_r"))
        Fixpoint.reliably(left.join(right,
            col("bl") === col("br") && col("kl") === col("kr") &&
              col("probe") === col("salt_r") &&
              (col("salt_l") =!= col("salt_r") || col("doc_l") < col("doc_r")))
          .select(least(col("doc_l"), col("doc_r")).as("doc_a"),
            greatest(col("doc_l"), col("doc_r")).as("doc_b"))
          .distinct()) // unsorted like the cold branch (round 19)
      }
    } finally Fixpoint.releaseAll(locals)
  }

  /** LSH banding: a band key = md5 of its bandSize signature slots;
    * candidate pairs = docs sharing any band key (distinct a<b pairs).
    * The self-join is per-bucket — the O(n²) blowup only happens inside
    * a bucket, which is the entire point of LSH at scale.
    *
    * Sizing the banding for a NEW corpus: run [[lshBandAdvisor]] first
    * — it measures the exact pair mass this join would produce at
    * every band size tiling the signature and picks the smallest one
    * whose candidate join stays within a linear-in-corpus budget
    * (recall is monotone-decreasing in band size, so smallest
    * affordable = max recall). [[lshBucketStats]] is the companion
    * per-occupancy-class breakdown of the same cost.
    */
  def minhashLsh(spark: SparkSession, dir: String,
      numHashes: Int = TestNumHashes, bandSize: Int = TestBandSize): DataFrame =
    if (Fixpoint.isPlanOnly)
      minhashLshFrom(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        numHashes, bandSize)
    else pairsMemo.get(spark, dir, (numHashes, bandSize))(
      minhashLshFrom(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        numHashes, bandSize))

  /** Session-shared LSH pair frame — [[componentsFrame]]'s pattern one
    * level down: SIX queries consume the same banded candidate pairs
    * (lsh_quality, source_overlap, dedup_sweep, neardup_pipeline,
    * split_leakage, and the components closure itself), and a
    * production pipeline bands once per corpus snapshot. minhashLsh
    * ends in a reliable checkpoint, so the memoized frame is an
    * immutable file scan; the same honesty rules apply (cleared by the
    * harness hook, bypassed under planOnly, dead sessions evicted,
    * data-fingerprint identity — see [[SessionMemo]]). Keyed on the
    * banding parameters so the parameterized sweep tests never collide
    * with the default tier.
    */
  private val pairsMemo = new SessionMemo[(Int, Int)]

  def minhashLshFrom(docs: DataFrame,
      numHashes: Int = TestNumHashes, bandSize: Int = TestBandSize,
      saltThreshold: Int = Int.MaxValue): DataFrame =
    lshPairsWith(minhashSignature(docs, numHashes), numHashes, bandSize,
      md5BandKey, saltThreshold)

  /** INCREMENTAL near-dup: a new batch against the existing corpus —
    * the shape production dedup actually runs (nobody re-pairs 100 TB
    * nightly; each ingest batch probes the standing signature store).
    * Same banding as [[minhashLsh]], but the join is ASYMMETRIC: batch
    * band keys × corpus band keys, so the quadratic term is
    * |batch| × bucket-occupancy, never corpus × corpus, and the corpus
    * side is exactly the persisted signature table an ingest pipeline
    * maintains. Batch here = doc_id % 10 == 0 (a pseudo new-arrivals
    * slice; production passes the real batch and reads the signature
    * store instead of recomputing it).
    */
  def dedupIncremental(spark: SparkSession, dir: String,
      numHashes: Int = TestNumHashes, bandSize: Int = TestBandSize): DataFrame = {
    require(numHashes % bandSize == 0, "bands must tile the signature")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    def banded(df: DataFrame) = {
      val sig = minhashSignature(df, numHashes)
      val bandCols = bandStructs(numHashes, bandSize, md5BandKey)
      sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    }
    // one signature pass for BOTH sides: banding is per-doc, so band
    // everything once, materialize the (tiny) band rows, and split by
    // filter — two banded(filter(...)) branches would each re-run the
    // full md5 signature pipeline (measured 2× the query cost at sf0.1).
    // Fast local staging + reliable pair output: zero pinned blocks on
    // return (the round-10 lifecycle rule).
    val locals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val all = Fixpoint.locally(banded(docs), locals)
    val batch = all.filter(col("doc_id") % 10 === 0)
    val corpus = all.filter(col("doc_id") % 10 =!= 0)
    try Fixpoint.reliably(batch.as("n").join(corpus.as("c"),
        col("n.band") === col("c.band") && col("n.bkey") === col("c.bkey"))
      .select(col("n.doc_id").as("new_doc"), col("c.doc_id").as("corpus_doc"))
      .distinct()
      .orderBy("new_doc", "corpus_doc"))
    finally Fixpoint.releaseAll(locals)
  }

  /** Benchmark decontamination — the n-gram collision test every
    * web-scale training corpus runs before shipping (the 13-gram rule of
    * the GPT-3 lineage; k=3 here to suit the synthetic corpus, same
    * plan): a training document is contaminated if it shares any word
    * k-shingle with the held-out benchmark set. The benchmark side is
    * tiny by definition, so its distinct shingles BROADCAST and the
    * training corpus is a single scan + broadcast-join + per-doc count —
    * no corpus self-join, no corpus shuffle except the final per-doc
    * aggregation. Benchmark here = doc_id % 97 == 0 (a pseudo held-out
    * slice; production passes a real benchmark table).
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    def shingleRows(df: DataFrame) = df
      .select(col("doc_id"),
        explode(array_distinct(Shingles.shingleArray(col("text"), 3))).as("shingle"))
    val bench = shingleRows(docs.filter(col("doc_id") % 97 === 0))
      .select("shingle").distinct()
    shingleRows(docs.filter(col("doc_id") % 97 =!= 0))
      .join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // shingles pre-deduped per doc
      .orderBy("doc_id")
  }

  /** Exact duplicated-SPAN detection — the substring-dedup signal for
    * training corpora (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better": exact repeated spans across
    * documents are the highest-precision dedup/boilerplate indicator;
    * the paper's 50-token suffix-array spans become word-8-gram spans
    * here). Per document: total 8-gram positions, positions whose gram
    * also appears in ANOTHER document, and the duplicated fraction in
    * integer basis points — the signal a pipeline thresholds to drop
    * boilerplate-heavy docs or clip repeated spans.
    *
    * Scale posture — the sorted-ngram-table plan, no suffix array and
    * NO pair join anywhere: one in-array shingle pass + explode, a
    * gram-keyed two-phase agg to find cross-doc grams (distinct-doc
    * count ≥ 2), one gram-keyed SEMI join back, and a doc-keyed agg.
    * Every shuffle is keyed by gram or doc_id (high cardinality,
    * distributes); cost is linear in corpus gram count regardless of
    * how many documents share a span.
    */
  def substringDedup(spark: SparkSession, dir: String): DataFrame =
    substringDedupFrom(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  def substringDedupFrom(docs: DataFrame): DataFrame = {
    // round 14: the gram-keyed shuffles ride a 60-bit md5 digest of
    // the gram, not the 8-word STRING — the string (~60-80 bytes/key)
    // paid 8-10× the bytes through the cross-doc agg and the semi
    // join for a value nothing downstream reads (at 100× those
    // exchanges flip to SMJ, so key width also prices the sorts).
    // The md5 prefix keeps the DuckDB twin bit-identical: same
    // digests ⇒ same collisions ⇒ same counts in both engines, so
    // ORACLE parity never depends on collision rarity. The rarity
    // itself is scale-bounded, not astronomical (ADVICE r14): 60 bits
    // give a birthday bound of n²/2⁶¹ ≈ 0.04 expected colliding pairs
    // at n=10⁸ distinct grams but ≈ 4 at n=10⁹ (the 100-TB regime) —
    // a collision merges two gram groups and drifts the dup-fraction
    // counts from true string semantics by ~1 gram in 10⁹. Where that
    // drift matters, widen the key: two independent 60-bit digests
    // (md5 prefix + suffix) or the full 128-bit md5 as the join key —
    // same plan, double key width, collision odds squared. Production
    // swaps xxhash64 for md5 — same plan, cheaper hash.
    // Round 18 (guide §2.4: remove shuffles outright; §2.3: shuffle
    // fewer bytes): the old shape computed the gram stream TWICE (once
    // under the cross-doc agg, once as the semi-join probe) and
    // exchanged it four times (countDistinct's (g,doc) partial + g
    // final, the probe by g, tot by doc). Now ONE gram pass is
    // exchanged ONCE by g; the per-(g,doc) multiplicity agg and the
    // distinct-doc count (a count window over g — rows are per (g,doc),
    // so plain count IS countDistinct(doc)) are colocated on that
    // exchange; per-doc totals come in-row from the word count
    // (n_grams = n_words − 7 exactly, since posexplode of the shingle
    // array yields one row per position — docs with <8 words produced
    // no gram rows before and are excluded by the same n_grams > 0
    // predicate here). Only dup-doc partial sums reach the final
    // doc-keyed exchange.
    val grams = Shingles.wordShingles(docs, 8)
      .select(col("doc_id"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10)
          .cast("bigint").as("g"))
    val gd = grams.repartition(col("g"))
      .groupBy(col("g"), col("doc_id")).agg(count(lit(1)).as("c"))
    val dup = gd
      .withColumn("ndocs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .filter(col("ndocs") >= 2)
      .groupBy(col("doc_id")).agg(sum(col("c")).as("nd"))
    val tot = docs.select(col("doc_id"), // coalesce: ADVICE r18 item 3
        (graft.functions.ShingleFunctions.wordCountF(
          coalesce(col("text"), lit(""))) - 7)
          .as("n_grams"))
      .filter(col("n_grams") > 0)
    tot.join(dup, Seq("doc_id"), "left")
      .withColumn("n_dup_grams", coalesce(col("nd"), lit(0L)))
      .withColumn("dup_bp", expr("(10000 * n_dup_grams) div n_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"), col("dup_bp"))
      .orderBy("doc_id")
  }

  /** Duplicated-span CLIPPING — the removal step that pairs with
    * [[substringDedup]]'s detection (Lee et al. 2022 drop/clip the
    * repeated spans themselves, not whole documents; C4 does the same
    * at line granularity). A word position is covered when any 8-gram
    * through it also appears in another document; covered words are
    * clipped and the survivors reassembled in order, so boilerplate
    * repeated across pages disappears while the unique prose stays.
    *
    * Scale posture — same sorted-ngram-table plan as substringDedup
    * plus two keyed joins, still no pair join anywhere: gram-keyed agg
    * finds cross-doc grams, a gram-keyed SEMI join marks dup gram
    * positions, coverage explodes to (doc, pos) and dedups on that
    * key, an anti join keyed by (doc, pos) drops covered words, and a
    * doc-keyed agg reassembles. Every shuffle key is high-cardinality;
    * cost stays linear in corpus gram count.
    */
  def spanClip(spark: SparkSession, dir: String): DataFrame =
    spanClipFrom(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  def spanClipFrom(docs: DataFrame): DataFrame = {
    // measured-both-ways note (round 14): [[substringDedupFrom]]'s
    // 60-bit digest keys were tried here too and REJECTED — span_clip's
    // wall is dominated by the coverage/removal machinery, not the gram
    // shuffles, so the per-gram md5 cost exceeded the narrower-key win
    // (100×: 28.1 s strings vs 35-39 s digests; substring_dedup, whose
    // cost IS the gram shuffles, kept the digests at a 2.0× win).
    //
    // Round 18 (guide §2.3/§2.4): the removal side no longer explodes
    // coverage to (doc, pos) rows. The old shape shuffled every covered
    // word position three times (coverage distinct, the (doc,pos) anti
    // join, the collect_list(struct(wpos, word)) reassembly agg — the
    // last one carrying the words themselves) and re-derived the word
    // array twice. Now the ONLY thing that leaves the gram stage is the
    // dup-gram START positions, folded per doc into one int array
    // (collect_list over ints, partial map-side), and one in-row kernel
    // ([[graft.functions.ShingleOps.clipSpans]]) marks coverage and
    // reassembles survivors per row — bit-identical to the anti-join +
    // ordered-agg form (boolean coverage mark = the distinct∘explode;
    // keeping uncovered words in order = the anti join + string_agg).
    val grams = Shingles.wordShingles(docs, 8)
      .select(col("doc_id"), col("shingle_pos"), col("shingle"))
    val crossDoc = grams.groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("shingle"))
    val dupStarts = grams.join(crossDoc, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("shingle_pos")).as("starts"))
    // coalesce(text, ""): the kernel is nullIntolerant — a null text
    // must keep the old wordArray "" semantics (n_words=0, clean "")
    // rather than null out the row (ADVICE r18 item 3)
    docs.join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        graft.functions.ShingleFunctions.spanClipF(
          coalesce(col("text"), lit("")),
          coalesce(col("starts"), typedLit(Array.empty[Int])), 8).as("r"))
      .select(col("doc_id"), col("r.n_words").as("n_words"),
        col("r.n_removed").as("n_removed"),
        col("r.clean_text").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Global FIRST-OCCURRENCE-WINS paragraph dedup with document
    * reconstruction — the C4/RefinedWeb line-dedup semantic (Raffel et
    * al. 2020 drop every repeated three-sentence span but KEEP ONE
    * occurrence; RefinedWeb's line dedup likewise keeps the first copy).
    * This is deliberately DIFFERENT from [[spanClip]], which removes ALL
    * copies of a cross-doc span from every document: here the earliest
    * (doc_id, paragraph_idx) occurrence of each distinct paragraph
    * survives and only the later repeats drop, so corpus-unique content
    * is never lost. Reference analog: the extract dedup contract
    * (commands/extract.md dedup notes) at sub-document granularity.
    *
    * The synthetic corpus has no newlines, so "paragraph" = each run of
    * 10 consecutive words (stride 10, partial tail kept) — production
    * swaps the segmenter for split('\n\n') with the same downstream
    * plan. Segmentation is PURE ARRAY expressions (the Shingles rule:
    * no shuffle, no per-doc window): full windows come from
    * shingleArray(10) filtered to every 10th position with the
    * index-lambda form (no outer-array reference — that form re-evals
    * the outer array per element, O(words²)), the partial tail from one
    * top-level slice.
    *
    * Dedup plan: the winner per 60-bit paragraph digest is ONE
    * min(struct(doc_id, p_idx, p_text)) agg — (doc_id, p_idx) lead the
    * struct comparison and are globally unique, so p_text rides along
    * without ever deciding a tie, and the agg's output IS the survivor
    * set: no winner join back, no second paragraph subtree for it
    * (measured 4.2 → 2.4-2.8 s at sf0.1 vs the join form). Partial agg
    * combines map-side — a hot boilerplate paragraph never funnels its
    * copies to one reducer the way a rn=1 window would. A doc-keyed agg
    * reassembles survivors in order. Every shuffle is keyed by digest
    * or doc_id — high cardinality, linear in corpus paragraph count.
    * The 60-bit digest keys follow [[substringDedupFrom]]'s
    * width/oracle-parity analysis (same md5-prefix construction in
    * DuckDB ⇒ identical collisions ⇒ identical counts).
    */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame =
    paragraphDedupFrom(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** Default paragraph width for the paragraph family (words per
    * synthetic paragraph; see [[paragraphDedup]]'s segmenter note).
    */
  val ParagraphWords = 10

  /** Width axis of [[paragraphSweep]] — ONE home shared by the default
    * argument and the oracle generator (Oracles.scala), so the query
    * and its oracle cannot silently diverge (the GopherRuleExprs/
    * LangPredCtes rule; ADVICE r15).
    */
  val SweepWidths: Seq[Int] = Seq(5, 10, 20)

  /** (doc_id, p_idx, p_text, dg) — the k-word paragraph rows of `docs`
    * with their 60-bit digests; the shared segmentation of the
    * paragraph family ([[paragraphDedupFrom]], [[paragraphSweep]],
    * [[paragraphAttribution]]). Pure array expressions + one Generate —
    * no shuffle (see the plan notes on [[paragraphDedup]]).
    */
  private[graft] def paragraphFrame(docs: DataFrame, k: Int): DataFrame = {
    val ws = Shingles.wordArray(col("text"))
    val nw = size(ws)
    // every k-th overlapping k-gram = the non-overlapping k-word windows
    val fullParas = filter(Shingles.shingleArray(col("text"), k),
      (_, i) => i % k === 0)
    // partial tail (words past the last full window), [] when none
    val tail0 = when(nw % k > 0,
      array(array_join(slice(ws, nw - (nw % k) + lit(1), lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    docs
      .select(col("doc_id"), posexplode(concat(fullParas, tail0)))
      .withColumnRenamed("pos", "p_idx").withColumnRenamed("col", "p_text")
      .withColumn("dg",
        conv(substring(md5(col("p_text")), 1, 15), 16, 10).cast("bigint"))
  }

  def paragraphDedupFrom(docs: DataFrame): DataFrame = {
    val K = ParagraphWords
    val nw = size(Shingles.wordArray(col("text")))
    val paras = paragraphFrame(docs, K)
    val kept = paras.groupBy(col("dg"))
      .agg(min(struct(col("doc_id"), col("p_idx"), col("p_text"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.p_idx").as("p_idx"),
        col("w.p_text").as("p_text"))
    // per-doc paragraph count = ceil(words/K) — one word count per row,
    // no second segmentation pass, no corpus shuffle. Measured both
    // ways twice (r15): the paras.groupBy form re-segmented the corpus
    // AND shuffled every paragraph row (sf0.1 2.4 s total); a
    // size(fullParas)+size(tail0) projection looked map-side but
    // re-built every overlapping 10-gram string just to take lengths —
    // HOFs are interpreted, no subexpression sharing — and LOST
    // (sf0.1 7.2 s, 100× 27.4 s vs 15.6). The arithmetic form keeps
    // the win without touching the arrays. Wordless docs stay
    // excluded, matching the oracle's tot CTE.
    val tot = docs
      .select(col("doc_id"),
        floor((nw + lit(K - 1)).cast("double") / K).cast("bigint").as("n_paras"))
      .filter(col("n_paras") > 0)
    val re = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("p_idx"), col("p_text")))),
        s => s.getField("p_text")), " ").as("clean_text"))
    tot.join(re, Seq("doc_id"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("n_dropped", col("n_paras") - col("n_kept"))
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
      .select(col("doc_id"), col("n_paras"), col("n_kept"), col("n_dropped"),
        col("clean_text"))
      .orderBy("doc_id")
  }

  /** Paragraph-width calibration sweep — the knob-freezing companion to
    * [[paragraphDedup]] (dedup_sweep's twin on the segmentation axis):
    * for each candidate width k, total paragraph instances, distinct
    * paragraphs, and the dropped share in basis points. Narrow windows
    * over-merge (more drops, more false merges of unrelated prose);
    * wide windows under-match — a pipeline runs this once per corpus
    * and freezes the k where yield stabilizes. One linear
    * explode + count/countDistinct agg per k (no pairs, no joins),
    * unioned into a bounded |k|-row report.
    */
  def paragraphSweep(spark: SparkSession, dir: String,
      widths: Seq[Int] = SweepWidths): DataFrame =
    paragraphSweepFrom(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")), widths)

  def paragraphSweepFrom(docs: DataFrame, widths: Seq[Int]): DataFrame = {
    widths.map { k =>
      paragraphFrame(docs, k)
        .agg(count(lit(1)).as("n_paras"),
          countDistinct(col("dg")).as("n_distinct"))
        .select(lit(k.toLong).as("k"), col("n_paras"), col("n_distinct"),
          (col("n_paras") - col("n_distinct")).as("n_dropped"),
          expr("(10000 * (n_paras - n_distinct)) div n_paras").as("drop_bp"))
    }.reduce(_.unionByName(_)).orderBy("k")
  }

  /** Directed paragraph-syndication matrix — WHO loses paragraphs TO
    * WHOM under [[paragraphDedup]]'s first-occurrence-wins rule: every
    * dropped paragraph copy is attributed to the (winner_source,
    * loser_source) edge, the provenance signal that distinguishes a
    * boilerplate-emitting hub from the feeds that mirror it
    * ([[sourceOverlap]]'s undirected doc-level matrix, made DIRECTED
    * and sub-document). Within-source edges (src_win = src_lose)
    * measure self-repetition.
    *
    * Scale: each loser row maps to exactly ONE winner via its digest —
    * the join-back is digest-keyed with a unique build side, linear in
    * dropped copies, never a pair explosion; source lookups are
    * doc-keyed; the output is bounded by |sources|².
    */
  def paragraphAttribution(spark: SparkSession, dir: String): DataFrame =
    paragraphAttributionFrom(Tables.documents(spark, dir))

  /** `d0` needs (doc_id, text, source). */
  def paragraphAttributionFrom(d0: DataFrame): DataFrame = {
    val paras = paragraphFrame(d0.select(col("doc_id"), col("text")),
      ParagraphWords)
    val winners = paras.groupBy(col("dg"))
      .agg(min(struct(col("doc_id"), col("p_idx"))).as("w"))
      .select(col("dg").as("wg"), col("w.doc_id").as("wd"),
        col("w.p_idx").as("wp"))
    val lost = paras.as("p").join(winners.as("k"), col("p.dg") === col("k.wg"))
      .filter(!(col("p.doc_id") === col("k.wd") && col("p.p_idx") === col("k.wp")))
      .select(col("k.wd").as("win_doc"), col("p.doc_id").as("lose_doc"))
    val srcs = d0.select(col("doc_id"), col("source"))
    lost
      .join(srcs.as("sw"), col("win_doc") === col("sw.doc_id"))
      .join(srcs.as("sl"), col("lose_doc") === col("sl.doc_id"))
      .groupBy(col("sw.source").as("src_win"), col("sl.source").as("src_lose"))
      .agg(count(lit(1)).as("n_paras"))
      .orderBy("src_win", "src_lose")
  }

  /** n-gram Jaccard similarity on a bounded candidate block (doc_id < 64
    * on both sides — fixed-size regardless of SF; production pairing
    * comes from minhashLsh candidates instead).
    * |A∩B| via join on distinct shingles, |A∪B| = |A|+|B|-|A∩B|.
    */
  /** Unthresholded exact pair Jaccard over every INTERSECTING pair of
    * `docs` (shared by [[ngramJaccard]] and [[lshQuality]] so ground
    * truth cannot drift between the similarity and audit surfaces).
    */
  private def pairJaccardFrom(docs0: DataFrame): DataFrame = {
    val docs = docs0.select(col("doc_id"), col("text"))
      .withColumn("sh_set", array_distinct(Shingles.shingleArray(col("text"), 3)))
    // shingle sets and their sizes both come from the array — the only
    // shuffle left is the intersect self-join itself
    val sh = docs.select(col("doc_id"), explode(col("sh_set")).as("shingle"))
    val sizes = docs.select(col("doc_id"), size(col("sh_set")).cast("bigint").as("n_sh"))
      .filter(col("n_sh") > 0)
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
  }

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    pairJaccardFrom(Tables.documents(spark, dir).filter(col("doc_id") < 64))
      // threshold calibrated to the synthetic corpus (max ≈ 224 bp);
      // production near-dup uses ~8000 bp — same plan
      .filter(col("jaccard_bp") >= 150)
      .orderBy("doc_a", "doc_b")
  }

  /** Asymmetric CONTAINMENT dedup (Broder's containment coefficient):
    * C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| — the quote/subset-duplication
    * detector Jaccard misses (a short doc fully embedded in a long one
    * has near-10000 containment but low Jaccard, because the union is
    * dominated by the long doc). Flags pairs where EITHER direction's
    * containment clears the threshold, emitting both directions so the
    * asymmetric relation (who contains whom) is visible.
    *
    * Same shingle-intersect plan as [[ngramJaccard]] (shared-shingle
    * equi-join on the bounded exact block; the corpus-scale tier runs
    * the identical arithmetic over the LSH candidate pairs, as
    * dedup_sweep does for Jaccard). All values exact integer basis
    * points.
    */
  def containmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 64)
      .select(col("doc_id"), col("text"))
      .withColumn("sh_set", array_distinct(Shingles.shingleArray(col("text"), 3)))
    val sh = docs.select(col("doc_id"), explode(col("sh_set")).as("shingle"))
    val sizes = docs.select(col("doc_id"), size(col("sh_set")).cast("bigint").as("n_sh"))
      .filter(col("n_sh") > 0)
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("cont_a_bp", expr("(10000 * n_common) div sa.n_sh"))
      .withColumn("cont_b_bp", expr("(10000 * n_common) div sb.n_sh"))
      // threshold calibrated to the synthetic corpus; production
      // subset-dup detection uses ~9000 bp — same plan
      .filter(col("cont_a_bp") >= 500 || col("cont_b_bp") >= 500)
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("cont_a_bp"), col("cont_b_bp"))
      .orderBy("doc_a", "doc_b")
  }

  /** Corpus-scale CONTAINMENT tier — the LSH-candidate form of
    * [[containmentDedup]] (round 14; that query audits the bounded
    * exact block, this runs the SAME Broder containment arithmetic
    * over the banded candidate pairs, exactly as dedup_sweep /
    * neardup_pipeline run the Jaccard tier at scale). The relation it
    * surfaces: a short doc embedded in a long one has near-10000
    * containment while its union-dominated Jaccard stays low — the
    * quote/subset duplication a Jaccard threshold alone misses once
    * banding has surfaced the pair.
    *
    * Scale posture: the session pair frame (reliable-checkpoint scan,
    * 7th consumer of [[minhashLsh]]'s memo) + two doc-keyed joins
    * against in-array shingle sets + an in-row intersect — no pair
    * explosion, no new shuffle class. Unthresholded (the verify
    * tier); production cuts at ~9000 bp like [[containmentDedup]].
    */
  def containmentPipeline(spark: SparkSession, dir: String): DataFrame = {
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_distinct(Shingles.shingleArray(col("text"), 3)).as("sh_set"))
      .filter(size(col("sh_set")) > 0)
    minhashLsh(spark, dir)
      .join(sets.select(col("doc_id").as("doc_a"), col("sh_set").as("sa")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh_set").as("sb")),
        Seq("doc_b"))
      .withColumn("n_common",
        size(array_intersect(col("sa"), col("sb"))).cast("bigint"))
      .withColumn("na", size(col("sa")).cast("bigint"))
      .withColumn("nb", size(col("sb")).cast("bigint"))
      .withColumn("cont_a_bp", expr("(10000 * n_common) div na"))
      .withColumn("cont_b_bp", expr("(10000 * n_common) div nb"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("cont_a_bp"), col("cont_b_bp"))
      .orderBy("doc_a", "doc_b")
  }

  /** LSH quality audit — the EMPIRICAL s-curve: per exact-Jaccard
    * decile, what fraction of pairs did the banded MinHash tier
    * actually surface? InvariantSpec pins the THEORETICAL curve
    * P(cand | s) = 1-(1-s^r)^b; this measures it in data, which is
    * what a pipeline owner tunes bands against ("measure, don't
    * guess"). The pair frame unions two scale-legal sources — the
    * bounded block's intersecting pairs (the low-Jaccard mass where
    * the curve must collapse toward 0) and the corpus-wide candidate
    * pairs with their exact verify Jaccard via [[graft.etl.Splits
    * .neardupPipeline]] (the high-Jaccard mass where it must rise
    * toward 10000). Zero-overlap non-candidate pairs stay outside the
    * frame: materializing them would need the cross join this repo
    * bans, and their candidate rate is structurally ~0.
    */
  def lshQuality(spark: SparkSession, dir: String): DataFrame = {
    val block = Tables.documents(spark, dir).filter(col("doc_id") < 64)
    // ONE banding pass: minhashLsh returns a reliable-checkpoint scan,
    // so both the exact-verify arm and the is_cand arm read the same
    // materialized pair frame (round 12 — this query used to run the
    // whole signature+banding pipeline twice)
    val pairs = minhashLsh(spark, dir)
    val truth = pairJaccardFrom(block)
      .select(col("doc_a"), col("doc_b"), col("jaccard_bp"))
      .unionByName(Splits.neardupVerify(spark, dir, pairs)
        .select(col("doc_a"), col("doc_b"), col("jaccard_bp")))
      .distinct() // overlap pairs carry identical jaccard rows
    val cands = pairs.withColumn("is_cand", lit(1L))
    truth.join(cands, Seq("doc_a", "doc_b"), "left")
      .withColumn("bucket", expr("jaccard_bp div 1000"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("is_cand"), lit(0L))).as("n_cands"))
      .withColumn("cand_rate_bp", expr("(10000 * n_cands) div n_pairs"))
      .orderBy("bucket")
  }

  /** Per-source duplication-burden attribution: which sources pay the
    * corpus's near-dup tax. On top of [[dedupComponents]]'s transitive
    * closure, rank each component by the canonical-survivor order
    * (n_chars desc, doc_id — [[dedupCanonical]]'s rule) and charge
    * every NON-survivor copy to its own source; per source emit the
    * doc count, clustered count, redundant count, and redundant share
    * — the "who's polluting the corpus" report an ingest owner reads
    * before renegotiating a source's crawl budget.
    *
    * Scale posture: ONE components closure (not two — the survivor
    * rank re-derives canonical semantics from the same comp frame
    * instead of re-running the closure), a component-keyed rank
    * window, and a source-keyed rollup.
    */
  def dupAttribution(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val comp = componentsFrame(spark, dir)
    val w = Window.partitionBy(col("component"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val flagged = comp.join(docs, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("redundant", when(col("rn") > 1, 1L).otherwise(0L))
    val perSrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val att = flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_clustered"), sum(col("redundant")).as("n_redundant"))
    perSrc.join(att, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_clustered"), lit(0L)).as("n_clustered"),
        coalesce(col("n_redundant"), lit(0L)).as("n_redundant"))
      .withColumn("redundant_bp", expr("(10000 * n_redundant) div n_docs"))
      .orderBy("source")
  }

  /** Connected-component CLUSTERING over the LSH candidate graph — the
    * step production dedup runs after pairing: near-dup pairs are not a
    * dedup decision until transitively closed (A~B, B~C ⇒ {A,B,C} is ONE
    * cluster with ONE keeper), cf. commands/extract.md dedup contract +
    * the MinHash lineage (Broder; MapReduce CC per Kiveris et al.).
    *
    * Distributed fixpoint, never a driver-side union-find: each node
    * starts labeled with itself; every round takes (1) the min label
    * over graph neighbors, then (2) a POINTER-JUMP lbl ← lbl(lbl) —
    * labels are always node ids, so the jump is a self-join — giving
    * O(log diameter) rounds instead of O(diameter). Labels only ever
    * decrease, so sum(lbl) is a monotone convergence witness; each round
    * is two hash-partitioned joins on bounded, persisted inputs (the
    * edge list, |pairs| rows — NOT the corpus). At 100 TB the corpus
    * never enters the loop: only candidate-pair nodes do, and real
    * near-dup graphs are sparse with tiny diameters (2-4 rounds).
    *
    * Output: every clustered doc with its component id (= min doc_id in
    * the component — the canonical keeper) and the cluster size.
    */
  /** Session-shared components closure — the production deployment
    * shape (r12 verdict item 4): `dedup_components`, `cluster_sizes`,
    * `dup_attribution` and `dedup_canonical` all consume the SAME
    * closure, and a pipeline computes it once per corpus snapshot and
    * fans out; re-deriving the ~4 s build per consumer is harness
    * isolation, not a deployment cost. The memo caches the
    * reliable-checkpoint scan per (session, dir) — immutable by
    * construction (the frame reads checkpoint files), zero
    * block-manager residue (PersistLifecycleSpec's contract is
    * untouched), and holding the frame keeps the ContextCleaner from
    * deleting its files. The bench/TimeQuery harnesses CLEAR it
    * between reps ([[clearComponentsMemo]]) so per-query timings stay
    * honest — min-of-reps over a warm memo would time only the
    * downstream aggregate; the measured shared-vs-isolated numbers
    * live in BASELINE.md (round 13). Bypassed under planOnly: caching
    * a passthrough lazy plan would poison later real executions.
    * Identity, eviction and locking discipline live in [[SessionMemo]]
    * (data-fingerprint keys: a regenerated `dir` gets a fresh closure,
    * never the stale checkpoint scan — ADVICE r13).
    */
  def componentsFrame(spark: SparkSession, dir: String): DataFrame =
    if (Fixpoint.isPlanOnly) dedupComponents(spark, dir)
    else componentsMemo.get(spark, dir, ())(dedupComponents(spark, dir))

  private val componentsMemo = new SessionMemo[Unit]

  /** Harness hook: drop every memoized closure AND pair frame so the
    * next consumer pays the full build (honest per-query timing), AND
    * delete their reliable-checkpoint files so N cleared snapshots
    * cost zero accumulated disk. Frames obtained from the memos before
    * a clear must not be re-read afterwards — their backing files are
    * gone (harness reps never do; production sessions don't clear).
    */
  def clearComponentsMemo(): Unit = {
    componentsMemo.clearAndRelease()
    pairsMemo.clearAndRelease()
  }

  def dedupComponents(spark: SparkSession, dir: String,
      numHashes: Int = TestNumHashes, bandSize: Int = TestBandSize): DataFrame =
    // pairs route through minhashLsh so the closure build shares the
    // session's banding pass with the pair-frame consumers
    dedupComponentsFrom(minhashLsh(spark, dir, numHashes, bandSize))

  /** pairs(doc_a < doc_b) → (doc_id, component, cluster_size).
    *
    * Lineage discipline: every round ends in an eager LOCAL checkpoint
    * ([[Fixpoint.locally]]), not `persist()`. A persist only truncates
    * RECOMPUTATION — the analyzed plan still nests the previous round's
    * plan (twice, via the pointer-jump self-join), so with persist alone
    * Catalyst re-optimizes an exponentially growing tree and the
    * fixpoint spends its time in the optimizer (measured 43 s at
    * sf0.1), not in the joins. The checkpoint materializes the round
    * AND resets the plan to a leaf. The FINAL result goes to a reliable
    * checkpoint and every round's local blocks are released before
    * returning — zero pinned residue (round-10 lifecycle rule; the
    * reliable final is also the executor-loss-tolerant piece a cluster
    * needs).
    */
  def dedupComponentsFrom(pairs: DataFrame): DataFrame = {
    val locals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      val edges = Fixpoint.locally(pairs
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v"))), locals)
      def lblSum(df: DataFrame): Long =
        df.agg(coalesce(sum(col("lbl")), lit(0L))).head.getLong(0)
      // Round 19 (guide §2.4): round 1 runs SPECIALIZED — labels start
      // as the identity, so the neighbor-min join against a labels
      // frame is vacuous (lbl(v) = v) and stepped₁(u) = min(u, min
      // N(u)) comes straight off one edge aggregate. This folds away
      // the separate labels-init distinct + checkpoint, its priming
      // sum action, and round 1's two label joins; rounds 2+ and the
      // label sequence are IDENTICAL (the convergence witness compares
      // s₁ vs s₂ onward — s₀ vs s₁ could only match on an empty edge
      // set, where the loop now just pays one extra no-op round).
      def jump(stepped: DataFrame): DataFrame = stepped.as("a")
        .join(stepped.as("b"), col("a.lbl") === col("b.node"), "left")
        .select(col("a.node").as("node"),
          coalesce(col("b.lbl"), col("a.lbl")).as("lbl"))
      val stepped1 = edges.groupBy(col("u")).agg(min(col("v")).as("nbl"))
        .select(col("u").as("node"), least(col("u"), col("nbl")).as("lbl"))
      var labels = Fixpoint.locally(jump(stepped1), locals)
      var prevSum = lblSum(labels)
      var converged = false
      var rounds = 1
      while (!converged) {
        rounds += 1
        // (1) min over neighbors (left join: isolated labels keep their own)
        val nbr = edges.as("e")
          .join(labels.as("l"), col("e.v") === col("l.node"))
          .groupBy(col("e.u").as("node")).agg(min(col("l.lbl")).as("nbl"))
        val stepped = labels.join(nbr, Seq("node"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("nbl"), col("lbl"))).as("lbl"))
        // (2) pointer-jump: follow the label one hop (lbl is a node id)
        val jumped = Fixpoint.locally(jump(stepped), locals)
        val curSum = lblSum(jumped)
        labels = jumped
        converged = curSum == prevSum
        prevSum = curSum
      }
      Fixpoint.lastRounds.put("components_closure", rounds)
      val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
      // unsorted (round 19): only the declared dedup_components surface
      // needs doc_id order — SparkEntry adds it on top of the memoized
      // scan; every other consumer aggregates, and the build was paying
      // a sampling pass + range exchange per isolated rebuild for it
      Fixpoint.reliably(labels.join(sizes, Seq("lbl"))
        .select(col("node").as("doc_id"), col("lbl").as("component"),
          col("cluster_size")))
    } finally Fixpoint.releaseAll(locals)
  }

  /** INCREMENTAL components closure — the daily-snapshot production
    * story (round 18, VERDICT r17 item 1): a corpus that grows ~1% per
    * day must not re-pay the full closure build per snapshot (the
    * SessionMemo invalidates WHOLESALE on any data-fingerprint change —
    * by design), so this computes closure(N+1) from closure(N) plus
    * only the DELTA pairs: closure(snapshot) + pairs touching new docs
    * → the merged assignment, verified EQUAL to the full recompute
    * (the oracle IS the full-recompute SQL; InvariantSpec pins
    * frame-level equality against [[componentsFrame]]).
    *
    * Reference semantics: the visited-set incremental contract
    * (scripts/crawler-queue.sh:123-161 — new arrivals merge into
    * standing state, never rebuild it); the batch twin of
    * [[graft.streaming.StreamingOps.streamingComponents]]'s
    * union-by-min fold, relationally.
    *
    * Delta convention matches [[dedupIncremental]]: new docs =
    * doc_id % 10 == 0 (a pseudo new-arrivals slice; production passes
    * the real snapshot assignment + the real delta pair frame to
    * [[mergeDeltaIntoClosure]] directly).
    *
    * WHY the merge is cheap: contracting each prior component to its
    * label turns the delta merge into a closure over the QUOTIENT
    * graph — nodes are (prior labels touched by the delta) ∪ (new
    * docs), edges are the delta pairs mapped through the prior
    * assignment. That graph is DELTA-sized, never corpus-sized, and
    * the final relabel is one label-keyed join against the standing
    * assignment (pair-graph-sized). Correctness: prior labels are the
    * min doc_id of their member sets, so the quotient closure's
    * min-fold recovers exactly the full closure's min — label
    * equality, not just partition equality.
    */
  def dedupComponentsIncremental(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLsh(spark, dir)
    val priorPairs = pairs
      .filter(col("doc_a") % 10 =!= 0 && col("doc_b") % 10 =!= 0)
    val deltaPairs = pairs
      .filter(col("doc_a") % 10 === 0 || col("doc_b") % 10 === 0)
    // closure(N): in production a stored artifact read from the
    // snapshot store; rebuilt here so the query is self-contained
    val prior = dedupComponentsFrom(priorPairs)
    Fixpoint.lastRounds.put("incremental_prior",
      Fixpoint.lastRounds.getOrDefault("components_closure", 0))
    mergeDeltaIntoClosure(prior, deltaPairs)
  }

  /** closure(N) + delta pairs → closure(N+1). `prior` is the standing
    * (doc_id, component, …) assignment (component = min member id —
    * [[dedupComponentsFrom]]'s labeling); `deltaPairs` the (doc_a <
    * doc_b) candidate pairs with at least one endpoint outside the
    * snapshot. Every shuffle is keyed by doc_id or label; the only
    * fixpoint runs on the delta-sized quotient graph.
    */
  private[graft] def mergeDeltaIntoClosure(prior: DataFrame,
      deltaPairs: DataFrame): DataFrame = {
    val pa = prior.select(col("doc_id"), col("component"))
    // delta pairs through the prior assignment: an endpoint inside the
    // snapshot is represented by its component label, an unassigned
    // endpoint (new doc, or old doc with no snapshot-side pair) by
    // itself. Pairs that land inside one prior component are already
    // closed and drop out.
    val quotient = deltaPairs
      .join(pa.select(col("doc_id").as("doc_a"), col("component").as("ca")),
        Seq("doc_a"), "left")
      .join(pa.select(col("doc_id").as("doc_b"), col("component").as("cb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("ca"), col("doc_a")).as("u"),
        coalesce(col("cb"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("doc_a"),
        greatest(col("u"), col("v")).as("doc_b"))
      .distinct()
    // min-label closure of the quotient graph (the same fixpoint core
    // as the full build — it is just running on a delta-sized input)
    val remap = dedupComponentsFrom(quotient)
      .select(col("doc_id").as("node"), col("component").as("new_comp"))
    Fixpoint.lastRounds.put("incremental_merge",
      Fixpoint.lastRounds.getOrDefault("components_closure", 0))
    // standing assignment ∪ newly-paired docs, then one label-keyed
    // relabel: a quotient node that merged follows its new label,
    // everything else keeps its standing one
    val newlyPaired = deltaPairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
      .join(pa.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("component"))
    val assigned = pa.unionByName(newlyPaired)
    val relabeled = assigned
      .join(remap, assigned("component") === remap("node"), "left")
      .select(col("doc_id"),
        coalesce(col("new_comp"), assigned("component")).as("component"))
    val sizes = relabeled.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    Fixpoint.reliably(relabeled.join(sizes, Seq("component"))
      .select(col("doc_id"), col("component"), col("cluster_size"))
      .orderBy("doc_id"))
  }

  /** Canonical-survivor selection — the END of the dedup pipeline:
    * cluster the LSH candidate graph ([[dedupComponents]]), keep ONE
    * representative per cluster (longest doc, doc_id tie-break — the
    * "best copy wins" policy), pass singletons through untouched. The
    * keeper pick is a struct-max aggregate keyed on the component (one
    * shuffle on a key that is by construction small), never a corpus
    * window; singletons are a left-anti join against the clustered set.
    * Output: the surviving corpus with provenance (cluster size, was it
    * deduped).
    */
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val comp = componentsFrame(spark, dir)
    val keepers = comp.join(docs, Seq("doc_id"))
      .groupBy(col("component"))
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("m"),
        min(col("cluster_size")).as("cluster_size")) // constant per component
      .select((-col("m.nid")).as("doc_id"), col("cluster_size"),
        lit(true).as("was_clustered"))
    val singles = docs.join(comp.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(1L).as("cluster_size"),
        lit(false).as("was_clustered"))
    keepers.unionByName(singles).orderBy("doc_id")
  }

  /** Quality × dedup interaction audit — does near-dup removal take
    * good or bad content? Token mass and mean quality of CLUSTERED
    * docs (members of any LSH component) vs singletons, the two-row
    * report a pipeline reads before trusting that dedup is not
    * silently skimming its best documents (duplicated content skewing
    * low-quality is the expected web pattern; the reverse is a red
    * flag). Rides the session-shared closure like every other
    * consumer; one scan + doc-keyed left join + 2-group agg (partial
    * map-side). Mean is exact integer basis points (sum div count).
    */
  def dupQualityProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = TextAnalysis.qualityAnnotated(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("tokens"), col("quality_bp"))
    val comp = componentsFrame(spark, dir).select(col("doc_id"), col("component"))
    docs.join(comp, Seq("doc_id"), "left")
      .groupBy(col("component").isNotNull.as("was_clustered"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("n_tokens"),
        expr("sum(quality_bp) div count(1)").as("avg_quality_bp"))
      .orderBy("was_clustered")
  }

  /** SimHash (16-bit): per word, a 16-bit hash from the md5 hex prefix;
    * bit b contributes +1/-1 by parity; the signature bit is the sign of
    * the sum. Hex→int via conv() is oracle-reproducible (DuckDB
    * CAST('0x…')). One explode + one groupBy — linear, shuffle on doc_id.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashFrom(Tables.documents(spark, dir))

  def simhashFrom(input: DataFrame): DataFrame = {
    // ONE compiled pass per doc (round 18): md5 per word + all 16
    // bit-sums + the sign fold in a single kernel
    // ([[graft.functions.SimHashSig]], hexChars=4). The transform +
    // 16 interpreted aggregate folds this replaces scanned the word
    // array 17 times per row; values are bit-identical (integer
    // addition is order-insensitive). Still a pure map — no explode,
    // no groupBy shuffle; the whole signature pass is one scan.
    val docs = input
      .select(col("doc_id"), Shingles.wordArray(col("text")).as("__ws"))
      .filter(size(col("__ws")) > 0)
    docs.select(col("doc_id"),
        graft.functions.ShingleFunctions.simhashF(col("__ws"), 4)
          .as("simhash16"))
      .orderBy("doc_id")
  }

  /** Dedup threshold sweep — the dial-setting curve for the near-dup
    * pipeline: for each candidate Jaccard cut, how many verified pairs
    * would merge and how many documents are touched. Run over the
    * corpus-wide LSH-candidate + exact-verify pairs
    * ([[graft.etl.Splits.neardupPipeline]]), so the curve prices the
    * threshold exactly where production would apply it. The bounded
    * 5-point axis joins against the pair frame once (pairs × 5, one
    * pass) — no per-threshold recomputation.
    */
  def dedupSweep(spark: SparkSession, dir: String): DataFrame = {
    val thr = Seq(500L, 9000L, 9600L, 9800L, 9880L)
    val axisArr = array(thr.map(lit): _*)
    val base = spark.range(thr.size).select(
      element_at(axisArr, (col("id") + 1).cast("int")).as("threshold"))
    // the verified pair frame is read by BOTH rollup branches, but its
    // expensive prefix (the banding self-join) is ALREADY a reliable
    // checkpoint inside minhashLsh — the re-run verify joins above it
    // are pair-frame-sized and cheap. Staging the verified frame
    // eagerly was measured SLOWER at sf0.1 (6.53 vs 5.83 s steady,
    // round 12): the checkpoint write costs more than the duplicated
    // branch, so the bounded-frame staging rule deliberately does NOT
    // apply here.
    val pt = Splits.neardupPipeline(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard_bp"))
      .select(col("*"), explode(axisArr).as("threshold"))
      .filter(col("jaccard_bp") >= col("threshold"))
    val np = pt.groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
    val nd = pt.select(col("threshold"),
        explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .distinct()
      .groupBy(col("threshold")).agg(count(lit(1)).as("n_docs"))
    base.join(np, Seq("threshold"), "left")
      .join(nd, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("threshold")
  }

  /** Cross-source syndication matrix: near-duplicate candidate pairs
    * ([[minhashLsh]]) rolled up to unordered (source, source) cells —
    * which sources copy from each other. The diagonal is within-source
    * boilerplate; off-diagonal mass is syndication/mirroring, the
    * signal a curation pipeline uses to pick ONE canonical feed per
    * syndicate before per-source budgets are set. Pair→source lookup
    * is two keyed joins against the doc→source projection; the rollup
    * key is normalized with least/greatest so each cell counts once.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    minhashLsh(spark, dir)
      .join(docs.select(col("doc_id").as("doc_a"),
        col("source").as("source_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"),
        col("source").as("source_b")), Seq("doc_b"))
      .groupBy(least(col("source_a"), col("source_b")).as("src1"),
        greatest(col("source_a"), col("source_b")).as("src2"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("src1", "src2")
  }

  /** Near-dup detector evaluation: precision / recall / F1 of the
    * SimHash bit-block tier ([[simhashNearDup]]) against exact 3-gram
    * Jaccard ground truth (threshold 150 bp — the corpus-calibrated
    * cut of [[ngramJaccard]]) on the bounded doc_id<64 audit slice.
    * The measure-don't-guess companion to [[lshQuality]]: that grades
    * the MinHash banding's s-curve, this grades the OTHER cheap tier
    * as a binary detector. All-pairs ground truth exists only inside
    * the bounded slice — the production pattern (audit a small block
    * exhaustively, extrapolate) — and every rate is exact integer bp.
    * Predicted pairs with zero shingle overlap count as false
    * positives via the full-outer join.
    */
  def neardupEval(spark: SparkSession, dir: String): DataFrame = {
    val truthAll = pairJaccardFrom(
        Tables.documents(spark, dir).filter(col("doc_id") < 64))
      .withColumn("is_truth",
        when(col("jaccard_bp") >= 150, 1L).otherwise(0L))
      .select(col("doc_a"), col("doc_b"), col("is_truth"))
    // the 16-bit tier is itself slice-bounded (round 16) — predictions
    // already live inside the same doc_id<64 audit block as the truth
    val pred = simhashNearDup(spark, dir)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("is_pred"))
    truthAll.join(pred, Seq("doc_a", "doc_b"), "full_outer")
      .select(coalesce(col("is_truth"), lit(0L)).as("t"),
        coalesce(col("is_pred"), lit(0L)).as("p"))
      .agg(sum(col("t")).as("n_truth"), sum(col("p")).as("n_pred"),
        sum(col("t") * col("p")).as("n_tp"))
      .withColumn("precision_bp", when(col("n_pred") === 0, 0L)
        .otherwise(expr("(10000 * n_tp) div n_pred")))
      .withColumn("recall_bp", when(col("n_truth") === 0, 0L)
        .otherwise(expr("(10000 * n_tp) div n_truth")))
      .withColumn("f1_bp",
        when(col("precision_bp") + col("recall_bp") === 0, 0L)
          .otherwise(expr(
            "(2 * precision_bp * recall_bp) div (precision_bp + recall_bp)")))
  }

  /** 60-bit SimHash signature — the WIDE tier [[simhashWideNearDup]]
    * bands over (15 md5 hex chars per word hash, the digest width the
    * gram keys use). Same in-array construction as [[simhashFrom]]'s
    * 16-bit signature: one md5 per word, 60 bit-sum aggregates, one
    * scan, no shuffle.
    */
  def simhashWideFrom(input: DataFrame): DataFrame = {
    // same compiled kernel as [[simhashFrom]] at hexChars=15 (60 bits):
    // one pass replaces a transform + 60 interpreted aggregate folds
    val docs = input
      .select(col("doc_id"), Shingles.wordArray(col("text")).as("__ws"))
      .filter(size(col("__ws")) > 0)
    docs.select(col("doc_id"),
      graft.functions.ShingleFunctions.simhashF(col("__ws"), 15)
        .as("simhash60"))
  }

  /** SimHash near-dup at SCALE — the Manku et al. 2007 (WWW: "Detecting
    * Near-Duplicates for Web Crawling") combination-key banding over a
    * 60-bit signature, the production tier next to [[simhashNearDup]]'s
    * 16-bit small-corpus form. The 16-bit tier's band domain is a FIXED
    * 64 buckets (4 blocks × 4 bits) — within-bucket pairs grow
    * quadratically with the corpus, and past ~10⁶ docs the 16-bit
    * VALUE space itself saturates (n²/2¹⁷ same-value pairs), so that
    * tier is corpus-bounded by its semantics, not just its plan.
    *
    * Here: 6 blocks × 10 bits; hamming ≤ 3 touches at most 3 blocks,
    * so at least one of the C(6,3) = 20 combinations of 3 blocks is
    * CLEAN on both sides (pigeonhole — recall 1, unit-tested against
    * brute force), and each combination key carries 30 bits: expected
    * random-collision candidates are 20·n²/2³¹ — at 10⁸ docs ~10⁸
    * candidate checks spread over 20 high-cardinality join keys, vs
    * ~10¹⁴ within-bucket pairs for the 16-bit tier. Production widens
    * further (128-bit signature → 60+-bit combination keys), same
    * plan. 20 probe rows per doc is the priced recall-1 cost.
    */
  def simhashWideNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashWideFrom(Tables.documents(spark, dir))
    def block(b: Int): Column =
      shiftright(col("simhash60"), b * 10).bitwiseAND(1023)
    val combos = (0 until 6).combinations(3).toSeq.zipWithIndex
    val keys = combos.map { case (bs, id) =>
      struct(lit(id).as("comb"),
        ((block(bs(0)) * 1048576L) + (block(bs(1)) * 1024L) + block(bs(2)))
          .as("ckey"))
    }
    val locals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val banded = Fixpoint.locally(sig
      .select(col("doc_id"), col("simhash60"), explode(array(keys: _*)).as("bs"))
      .select(col("doc_id"), col("simhash60"),
        col("bs.comb").as("comb"), col("bs.ckey").as("ckey")), locals)
    try Fixpoint.reliably(banded.as("x").join(banded.as("y"),
        col("x.comb") === col("y.comb") && col("x.ckey") === col("y.ckey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash60").bitwiseXOR(col("y.simhash60")))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy("doc_a", "doc_b"))
    finally Fixpoint.releaseAll(locals)
  }

  /** SimHash NEAR-DUP pairing over the BOUNDED AUDIT SLICE — completes
    * the SimHash family the way LSH banding completes MinHash:
    * candidates = docs sharing any of 4 contiguous 4-bit blocks of the
    * signature (pigeonhole: hamming ≤ 3 ⇒ at least one block identical,
    * so the ≤2 threshold has recall 1); verification = popcount of the
    * XOR on candidates only.
    *
    * Bounded BY DESIGN (round 16, closing VERDICT r15's lead item): a
    * 16-bit signature's band domain is a FIXED 64 keys (4 blocks × 4
    * bits), so a full-corpus pairing grows as n²/64 within-bucket pairs
    * — the full-corpus control was measured intractable at 100×
    * (BASELINE.md r15 wave 2), and past ~10⁶ docs the 16-bit VALUE
    * space itself saturates (n²/2¹⁷ genuine hamming-0 pairs). The tier
    * therefore pairs only inside the doc_id<64 audit slice — the
    * [[neardupEval]]/[[lshQuality]] production pattern (audit a small
    * block exhaustively, extrapolate) — with the slice filter BEFORE
    * the signature build, so it reaches the parquet scan
    * (PlanSpec-pinned) and the whole query is slice-sized regardless of
    * corpus size. The CORPUS tier is [[simhashWideNearDup]]: 60-bit
    * signature, Manku combination-key banding with 30-bit keys,
    * recall-1 pigeonhole for hamming ≤ 3, verified at 100× where this
    * tier's full-corpus form was stopped.
    */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashFrom(
        Tables.documents(spark, dir).filter(col("doc_id") < 64))
      .select(col("doc_id"), col("simhash16"))
    val blocks = (0 until 4).map(b => struct(lit(b).as("blk"),
      shiftright(col("simhash16"), b * 4).bitwiseAND(15).as("bval")))
    val locals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val banded = Fixpoint.locally(sig
      .select(col("doc_id"), col("simhash16"), explode(array(blocks: _*)).as("bs"))
      .select(col("doc_id"), col("simhash16"),
        col("bs.blk").as("blk"), col("bs.bval").as("bval")), locals)
    try Fixpoint.reliably(banded.as("x").join(banded.as("y"),
        col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash16").bitwiseXOR(col("y.simhash16")))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= 2)
      .distinct()
      .orderBy("doc_a", "doc_b"))
    finally Fixpoint.releaseAll(locals)
  }

  /** LSH band-bucket occupancy profile — the banded self-join's COST
    * MODEL, measured (round 14; the "measure, don't guess" companion
    * to [[lshQuality]]: that grades recall, this grades join cost).
    * Per power-of-two occupancy class: how many (band, bkey) buckets
    * land there, the doc rows they hold, the pair mass Σ c·(c−1)/2
    * they contribute to the candidate join, and its share. LSH join
    * cost IS the pair mass; a heavy top class (giant buckets) is the
    * template-boilerplate signature that says "tighten bands or
    * pre-clip spans" BEFORE the join runs — the dial an ingest owner
    * reads alongside [[candidateProbability]]'s recall curve.
    *
    * Scale posture: one signature scan (in-array, shuffle-free), one
    * (band, bkey)-keyed agg (high-cardinality key), one ≤6-row class
    * agg, one 1-row total broadcast. Never builds the pairs
    * themselves — the profile prices the join WITHOUT paying for it,
    * which is the whole point at 100 TB.
    */
  def lshBucketStats(spark: SparkSession, dir: String,
      numHashes: Int = TestNumHashes, bandSize: Int = TestBandSize): DataFrame = {
    require(numHashes % bandSize == 0, "bands must tile the signature")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val sig = minhashSignature(docs, numHashes)
    val bandCols = bandStructs(numHashes, bandSize, md5BandKey)
    val occ = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .groupBy(col("bs.band").as("band"), col("bs.bkey").as("bkey"))
      .agg(count(lit(1)).as("c"))
    val occClass = when(col("c") < 2, 0).when(col("c") < 4, 1)
      .when(col("c") < 8, 2).when(col("c") < 16, 3)
      .when(col("c") < 32, 4).otherwise(5)
    // ≤6 rows read by BOTH the totals branch and the share projection —
    // the bounded-frame staging rule: without the eager checkpoint each
    // branch re-derives the whole signature+occupancy pipeline (two
    // corpus scans for a 6-row frame)
    val cls = Fixpoint.reliably(occ.withColumn("occ_class", occClass.cast("int"))
      .groupBy(col("occ_class"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("c")).as("doc_rows"),
        sum(expr("(c * (c - 1)) div 2")).as("pair_mass")))
    val tot = cls.agg(sum(col("pair_mass")).as("tp"))
    cls.crossJoin(broadcast(tot))
      .withColumn("pair_share_bp",
        when(col("tp") === 0, lit(0L))
          .otherwise(expr("(10000 * pair_mass) div tp")))
      .select(col("occ_class"), col("n_buckets"), col("doc_rows"),
        col("pair_mass"), col("pair_share_bp"))
      .orderBy("occ_class")
  }

  /** LSH band-parameter ADVISOR — closes the loop on
    * [[lshBucketStats]] (VERDICT r14 item 3): that query prices the
    * banded join's pair mass; this one USES the price to derive the
    * band size that keeps the candidate join within a budget — the
    * LSH analog of [[GraphCuration.adaptiveBits]].
    *
    * Mechanism: for every band size r that tiles the signature
    * (r = 2, 4, 8 at the test preset), the bucket key is the CONCAT of
    * r adjacent minhash columns, so ONE signature pass measures the
    * TRUE (band, key) occupancy — and therefore the exact pair mass
    * Σ c·(c−1)/2 the banded join would produce — at every candidate r
    * simultaneously. No s-curve model, no re-banding: doubling r can
    * only split buckets, and the advisor reads the measured split.
    * The budget is linear in the corpus (`budgetPerDoc` candidate
    * pairs per signed doc — candidate-join output a cluster can
    * absorb); chosen = the SMALLEST r within budget (recall falls
    * monotonically with r, so the smallest affordable r maximizes
    * recall), falling back to the largest r when nothing fits (the
    * minimum-mass configuration). Pure integer arithmetic over
    * measured counts — DuckDB replays it bit-for-bit.
    *
    * Scale posture: one signature scan (in-array, shuffle-free), one
    * explode bounded by Σ bands(r) ≤ 7 rows/doc, one high-cardinality
    * (r, band, key) agg, a ≤3-row class frame (checkpointed for its
    * two readers), 1-row budget/pick broadcasts. Like the profile it
    * extends, it never builds the pairs it prices.
    */
  def lshBandAdvisor(spark: SparkSession, dir: String,
      numHashes: Int = TestNumHashes, budgetPerDoc: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val sig = minhashSignature(docs, numHashes)
    val sizes = Iterator.iterate(TestBandSize)(_ * 2)
      .takeWhile(r => r <= numHashes && numHashes % r == 0).toSeq
    val bandCols = sizes.flatMap { r =>
      (0 until numHashes / r).map { b =>
        struct(lit(r).as("band_size"), lit(b).as("band"),
          concat_ws("|", (0 until r).map(i => col(s"mh_${b * r + i}")): _*)
            .as("key"))
      }
    }
    val occ = sig.select(explode(array(bandCols: _*)).as("bs"))
      .groupBy(col("bs.band_size").as("band_size"),
        col("bs.band").as("band"), col("bs.key").as("key"))
      .agg(count(lit(1)).as("c"))
    // ≤3 rows read by the budget agg, the pick agg, and the final
    // projection — the bounded-frame staging rule
    val cells = Fixpoint.reliably(occ.groupBy(col("band_size"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("c")).as("doc_rows"),
        sum(expr("(c * (c - 1)) div 2")).as("pair_mass")))
    // the one-band tiling (r = numHashes) holds each signed doc exactly
    // once, so its doc_rows IS the signed-doc count — the budget base
    // without a second corpus scan
    val budget = cells.agg(
      (sum(when(col("band_size") === numHashes, col("doc_rows")))
        * budgetPerDoc).as("pair_budget"))
    val j = cells.crossJoin(broadcast(budget))
      .withColumn("n_bands", expr(s"$numHashes div band_size").cast("int"))
      .withColumn("within_budget", col("pair_mass") <= col("pair_budget"))
    val pick = j.agg(coalesce(
      min(when(col("within_budget"), col("band_size"))),
      max(col("band_size"))).as("pick"))
    j.crossJoin(broadcast(pick))
      .withColumn("chosen", col("band_size") === col("pick"))
      .select(col("band_size"), col("n_bands"), col("n_buckets"),
        col("doc_rows"), col("pair_mass"), col("pair_budget"),
        col("within_budget"), col("chosen"))
      .orderBy("band_size")
  }

  /** Duplicate-cluster size distribution in power-of-two buckets — the
    * power-law audit over [[dedupComponents]]'s closure: a heavy tail
    * (a few giant clusters owning most clustered docs) means template
    * boilerplate and argues for the substring tier; many pairs means
    * organic near-dups. Reports per bucket the cluster count, the doc
    * mass those clusters own, and its share of all clustered docs —
    * the "how bad is our duplication, structurally" dashboard.
    *
    * Scale posture: one row per component from the closure (already
    * pair-bounded), map-side bucketing, one bucket agg, 1-row totals
    * broadcast. Output ≤ 7 rows.
    */
  def clusterSizes(spark: SparkSession, dir: String): DataFrame = {
    val comp = componentsFrame(spark, dir)
      .select(col("component"), col("cluster_size")).distinct()
    val bucket = when(col("cluster_size") < 4, 0)
      .when(col("cluster_size") < 8, 1).when(col("cluster_size") < 16, 2)
      .when(col("cluster_size") < 32, 3).when(col("cluster_size") < 64, 4)
      .when(col("cluster_size") < 128, 5).otherwise(6)
    // <=7 rows feeding both totals and shares. Round 18: this USED to
    // be a reliable checkpoint ("so the components closure isn't
    // re-derived per branch") — but since the closure moved into
    // SessionMemo (round 14) [[componentsFrame]] already IS a
    // checkpoint scan, so each branch replay is one trivial agg over
    // checkpoint files. Removing the extra checkpoint measured
    // NEUTRAL at sf0.1 (the ~+0.8 s this query carries over
    // dedup_components is stage-count latency, not the checkpoint);
    // kept because it drops a write+read round trip and per-call
    // temp-file churn for identical results.
    val cells = comp.withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("doc_mass"))
    val tot = cells.agg(sum(col("doc_mass")).as("total_docs"))
    cells.crossJoin(broadcast(tot))
      .withColumn("mass_bp", expr("(10000 * doc_mass) div total_docs"))
      .select(col("bucket"), col("n_clusters"), col("doc_mass"),
        col("mass_bp"))
      .orderBy("bucket")
  }
}
