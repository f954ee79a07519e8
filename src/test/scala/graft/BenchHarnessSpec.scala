package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's own logic (no Spark needed): the prior-BENCH
  * parser feeding the outlier rerun guard. A wrong parse silently
  * disables the guard (empty map) or, worse, mis-prices priors — pin
  * the contract on a realistic committed-file shape.
  */
class BenchHarnessSpec extends AnyFunSuite {

  test("parsePriorQueries reads the queries map past leading fields") {
    val txt = """{"metric":"total","value":244.403,"unit":"sec",""" +
      """"n_errors":0,"errors":{},"reran":["a_q"],""" +
      """"queries":{"q1_agg":0.513,"token_chunk":6.213,"zorder_layout":1.05},""" +
      """"cold":{"q1_agg":1.2},"sf":"/root/testdata/sf0.1"}"""
    val got = Bench.parsePriorQueries(txt)
    assert(got == Map("q1_agg" -> 0.513, "token_chunk" -> 6.213,
      "zorder_layout" -> 1.05))
  }

  test("parsePriorQueries: empty errors map is not mistaken for queries") {
    // "errors":{} precedes "queries":{...} in the real file — the
    // parser must anchor on the queries key, not the first brace
    val txt = """{"errors":{"broken_q":"SomeException: x"},"queries":{"a":1.0}}"""
    assert(Bench.parsePriorQueries(txt) == Map("a" -> 1.0))
  }

  test("parsePriorQueries degrades to empty on malformed/missing input") {
    assert(Bench.parsePriorQueries("").isEmpty)
    assert(Bench.parsePriorQueries("{\"metric\":\"total\"}").isEmpty)
    assert(Bench.parsePriorQueries("{\"queries\":{unterminated").isEmpty)
    assert(Bench.parsePriorQueries("{\"queries\":{}}").isEmpty)
  }
}
