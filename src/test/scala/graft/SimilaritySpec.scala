package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality invariants against the exact baseline (sf0.001 tables):
  * growing the probe set can only improve recall, so the multi-probe
  * variant must sit between single-probe and brute force.
  */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def topPairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select("qid", "cid").as[(Long, Long)].collect().toSet

  test("multi-probe recall@5 is between single-probe and brute force") {
    val brute = topPairs("knn_brute") // exact top-5 = ground truth
    val single = topPairs("knn_bucketed")
    val multi = topPairs("knn_multiprobe")
    val rSingle = (single & brute).size
    val rMulti = (multi & brute).size
    assert(rMulti >= rSingle,
      s"multi-probe lost recall: $rMulti < $rSingle of ${brute.size}")
    assert(rMulti <= brute.size)
    // probing 4 of 8 cells must find at least half the true neighbors
    // on this corpus (sanity floor, not a tight bound)
    assert(rMulti * 2 >= brute.size, s"recall floor: $rMulti/${brute.size}")
  }
}
