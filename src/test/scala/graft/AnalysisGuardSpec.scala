package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for environment drift: every driver-contract query must at
  * least ANALYZE against the testdata that is actually on disk. In r7
  * the driver regenerated events.parquet with a different `ts` encoding
  * and 20 queries failed analysis for a whole round without any test
  * going red — `sbt test` exercised the operators on hand-built frames,
  * never the `SparkEntry.queries` closures against `/root/testdata`.
  * `.schema` forces full analysis (resolution + type checks) without
  * executing the plan, so this stays cheap for the ~190 lazy queries;
  * the handful of eager fixpoints (crawl/kmeans/BPE) do run, at
  * sf0.001 where they are sub-second.
  */
class AnalysisGuardSpec extends AnyFunSuite with SparkTestBase {

  test("every SparkEntry query analyzes against the on-disk testdata") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).schema; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} " +
          Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(200))
      }
    }
    assert(bad.isEmpty, s"${bad.size} queries fail analysis:\n" + bad.mkString("\n"))
  }

  test("query and oracle key sets are identical (no orphan on either side)") {
    // the round-9 lesson behind SparkEntry.queryList's duplicate guard:
    // a shadowed key shrinks both maps IDENTICALLY, so only an explicit
    // parity + count check catches surface drift
    val q = SparkEntry.queries.keySet
    val o = Oracles.all.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }
}
