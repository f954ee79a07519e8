package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{Crawl, GraphCuration}

/** Persist-lifecycle contract for the graph fixpoint family (r9 verdict
  * item 2): every operator releases its own pinned frames — composing
  * graph queries back-to-back WITHOUT the Verify/Bench harness scrub
  * must leave `getPersistentRDDs` empty after each materialization.
  * The mechanism is [[graft.etl.Fixpoint.reliably]]: per-round state is
  * eagerly written to a reliable checkpoint (persist → checkpoint →
  * unpersist), so the returned frame reads checkpoint FILES and no
  * block-manager residue survives the call.
  */
class PersistLifecycleSpec extends AnyFunSuite with SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def assertNoPins(tag: String): Unit = {
    val pinned = spark.sparkContext.getPersistentRDDs
    assert(pinned.isEmpty,
      s"$tag left ${pinned.size} pinned RDD(s): " +
        pinned.values.map(r => s"${r.id}:${r.name}").mkString(", "))
  }

  // Other suites share this JVM's session; scrub once up front so any
  // residue the assertions see is attributable to THESE operators.
  private def freshStart(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("graph fixpoints compose without harness scrub: zero pinned RDDs " +
      "after each materialization") {
    freshStart()
    val ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "pprSeed" -> (() => Crawl.pprSeed(spark, dir)),
      "pagerankIter" -> (() => Crawl.pagerankIter(spark, dir)),
      "hitsScores" -> (() => Crawl.hitsScores(spark, dir)),
      "bfsLayers" -> (() => Crawl.bfsLayers(spark, dir)),
      "crawlBfs" -> (() => Crawl.crawlBfs(spark, dir)),
      "crawlPriority" -> (() => Crawl.crawlPriority(spark, dir)),
      "triangleCounts" -> (() => Crawl.triangleCounts(spark, dir)),
      "kcore" -> (() => GraphCuration.kcore(spark, dir)))
    ops.foreach { case (name, op) =>
      assert(op().count() > 0, s"$name returned no rows")
      assertNoPins(name)
    }
  }

  test("the dedup / ANN / grid families also compose clean: zero pinned " +
      "RDDs after each materialization (round-10 engine-wide sweep)") {
    freshStart()
    // the queries whose operators formerly pinned persist()/
    // localCheckpoint() blocks for the harness scrub to clean
    val qs = Seq("minhash_lsh", "simhash_neardup", "dedup_incremental",
      "dedup_components", "cluster_sizes", "mmr_diversify", "ivf_sweep",
      "knn_pq_trained", "pca_power", "survival_hazard", "conversion_lag",
      "slo_burn", "bpe_train", "page_id_gen", "bloom_prefilter",
      "t_closeness",
      // round-11 eager operators (locally-staged + reliable final)
      "bleu_eval", "rouge_eval", "chrf_eval", "wer_eval", "rbo_overlap",
      "cms_frequency", "ap_eval",
      // round-13 eager operators: staged token/length frames + sketch
      // aggs / GroupTopK cuts above them
      "kmv_novelty", "quantile_digest", "quantile_weighted", "summary_extract")
    qs.foreach { name =>
      assert(SparkEntry.queries(name)(spark, dir).count() > 0,
        s"$name returned no rows")
      assertNoPins(name)
    }
  }

  test("released results stay re-executable (checkpoint-backed lineage)") {
    freshStart()
    val bfs = Crawl.crawlBfs(spark, dir)
    val pr = Crawl.pagerankIter(spark, dir)
    // two actions each: the second re-executes the returned frame after
    // the operator already unpersisted its intermediates
    assert(bfs.count() == bfs.count())
    val prFirst = pr.orderBy("node").limit(1).collect()
    assert(prFirst.sameElements(pr.orderBy("node").limit(1).collect()))
    assertNoPins("re-execution")
  }
}
