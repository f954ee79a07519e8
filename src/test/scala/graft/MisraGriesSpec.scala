package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGries

/** The Misra-Gries guarantee (any key with count > N/(capacity+1) is in
  * the summary) must survive arbitrary reduce orderings AND the
  * mergeable-summaries merge rule — that guarantee is what lets
  * Skew.heavyHitters claim exact equality with a plain GROUP BY.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def run(mg: MisraGries, stream: Seq[String]): Map[String, Long] =
    stream.foldLeft(mg.zero)(mg.reduce)

  test("sequential guarantee: frequent keys survive a hostile tail") {
    val mg = new MisraGries(4)
    // N=100: 'a' 30, 'b' 25, tail 45 singletons; threshold N/5=20
    val stream = new scala.util.Random(7)
      .shuffle(List.fill(30)("a") ++ List.fill(25)("b") ++
        (0 until 45).map(i => s"t$i").toList)
    val out = mg.finish(run(mg, stream))
    assert(out.contains("a") && out.contains("b"), out.mkString(","))
    assert(out.length <= 4)
  }

  test("merge guarantee: partitioned summaries keep frequent keys") {
    val mg = new MisraGries(4)
    val hot = List.fill(40)("x") ++ List.fill(30)("y")
    val tail = (0 until 60).map(i => s"t$i").toList
    // worst case: hot keys concentrated in one partition, tails in others
    val parts = Seq(hot, tail.take(20), tail.slice(20, 40), tail.drop(40))
    val merged = parts.map(run(mg, _)).reduce(mg.merge)
    val out = mg.finish(merged)
    // N=130, capacity 4 => guaranteed for count > 26: x(40), y(30)
    assert(out.contains("x") && out.contains("y"), out.mkString(","))
    assert(merged.size <= 4)
  }

  test("merge is capacity-bounded and never resurrects dropped keys") {
    val mg = new MisraGries(2)
    val b1 = run(mg, List("a", "a", "a", "b", "b", "c")) // c evicts/decrements
    val b2 = run(mg, List("d", "d", "e", "e", "f"))
    val m = mg.merge(b1, b2)
    assert(m.size <= 2, m.toString)
    assert(m.values.forall(_ > 0L))
  }

  test("undercount only: summary counts never exceed true counts") {
    val mg = new MisraGries(3)
    val stream = List("a", "b", "a", "c", "d", "a", "e", "a", "b")
    val b = run(mg, stream)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
    b.foreach { case (k, v) => assert(v <= truth(k), s"$k overcounted") }
  }
}
