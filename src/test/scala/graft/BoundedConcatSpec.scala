package graft

import scala.collection.immutable.TreeMap
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BoundedConcat

class BoundedConcatSpec extends AnyFunSuite {

  private def run(agg: BoundedConcat, items: Seq[(Long, String)]): String =
    agg.finish(items.foldLeft(agg.zero)(agg.reduce))

  test("keeps the maximal by-key prefix within the budget") {
    val agg = BoundedConcat(10)
    assert(run(agg, Seq(1L -> "aaa", 2L -> "bbb", 3L -> "ccc")) == "aaa|bbb")
    // 3+1+3 = 7 <= 10; adding ccc => 11 > 10
  }

  test("result is independent of arrival and merge order") {
    val agg = BoundedConcat(10)
    val items = Seq(3L -> "ccc", 1L -> "aaa", 2L -> "bbb")
    assert(run(agg, items) == "aaa|bbb")
    // split across "partitions", merge both ways
    val left = Seq(3L -> "ccc").foldLeft(agg.zero)(agg.reduce)
    val right = Seq(1L -> "aaa", 2L -> "bbb").foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(left, right)) == "aaa|bbb")
    assert(agg.finish(agg.merge(right, left)) == "aaa|bbb")
  }

  test("buffer never exceeds the budget (IRON RULE by construction)") {
    val agg = BoundedConcat(20)
    val big = (1L to 100L).map(i => i -> ("x" * 7))
    val buf = big.foldLeft(agg.zero)(agg.reduce)
    val joined = buf.values.mkString("|")
    assert(joined.length <= 20)
    assert(buf.size <= 3)
  }

  test("single oversized piece yields empty output") {
    val agg = BoundedConcat(5)
    assert(run(agg, Seq(1L -> "toolongpiece")) == "")
  }

  test("late-arriving smaller key displaces the tail, never re-adds") {
    val agg = BoundedConcat(7)
    val b1 = Seq(2L -> "bbb", 3L -> "ccc").foldLeft(agg.zero)(agg.reduce) // both fit
    val b2 = agg.reduce(b1, 1L -> "aaa") // aaa|bbb = 7 fits, ccc no longer
    assert(agg.finish(b2) == "aaa|bbb")
  }
}
