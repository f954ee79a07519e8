package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.Urls

class UrlsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("url").select(Urls.normalizeUrl(col("url"))).as[String].head()

  test("F3: normalizer strips #anchor and trailing slash") {
    assert(norm("https://a.com/p#sec") == "https://a.com/p")
    assert(norm("https://a.com/p/") == "https://a.com/p")
    assert(norm("https://a.com/p#a/b#c") == "https://a.com/p")
    assert(norm("https://a.com/p") == "https://a.com/p")
  }

  test("F1: skip filter drops media extensions and auth/static paths") {
    val urls = Seq(
      "https://a.com/doc.pdf" -> false,
      "https://a.com/x.css" -> false,
      "https://a.com/login" -> false,
      "https://a.com/static/app" -> false,
      // reference semantics (crawler-queue.sh:211-216): patterns are
      // case-insensitive SUBSTRINGS, extensions case-sensitive + terminal
      "https://a.com/logins" -> false,
      "https://a.com/LOGIN/x" -> false,
      "https://a.com/x.PDF" -> true,
      "https://a.com/doc.pdf.html" -> true, // extension must be terminal
      "https://a.com/page/9" -> true)
    val got = urls.map(_._1).toDF("url")
      .select(col("url"), Urls.keepUrl(col("url")).as("k"))
      .as[(String, Boolean)].collect().toMap
    urls.foreach { case (u, want) => assert(got(u) == want, u) }
  }

  test("F2/X6: domain extraction") {
    val d = Seq("https://sub.a.com/x/y", "http://b.io", "https://c.net/")
      .toDF("url").select(Urls.urlDomain(col("url"))).as[String].collect().toSeq
    assert(d == Seq("sub.a.com", "b.io", "c.net"))
  }

  test("X5: slug is [A-Za-z0-9_]+, <=50 chars, scheme-stripped") {
    val s = Seq("https://a.com/" + "path/" * 30).toDF("url")
      .select(Urls.urlSlug(col("url"))).as[String].head()
    assert(s.length <= 50)
    assert(s.matches("[A-Za-z0-9_]+"))
    assert(!s.startsWith("https"))
    assert(s.startsWith("a_com_"))
  }

  test("X1: score_link weights are 3/5/2 with a cap of 10") {
    def score(u: String, a: String, c: String): Int =
      Seq((u, a, c)).toDF("url", "anchor", "ctx")
        .select(Urls.scoreLink(col("url"), col("anchor"), col("ctx"), "topic").as("s"))
        .head().getInt(0)
    assert(score("x", "y", "z") == 0)
    assert(score("topic", "y", "z") == 3)
    assert(score("x", "topic", "z") == 5)
    assert(score("x", "y", "topic") == 2)
    assert(score("topic", "topic", "topic") == 10) // 3+5+2 capped
  }

  test("X3: priority parent bonus is 3 (>=8), 1 (>=5), else 0") {
    val got = Seq((4, 8), (4, 9), (4, 5), (4, 7), (4, 4), (4, 0))
      .toDF("s", "p")
      .select(Urls.priority(col("s"), col("p")).as("pr"))
      .as[Int].collect().toSeq
    assert(got == Seq(7, 7, 5, 5, 4, 4))
  }

  test("J1: anti-join result is disjoint from visited") {
    val frontier = Seq("u1", "u2", "u3", "u4").toDF("norm_url")
    val visited = Seq("u2", "u4").toDF("norm_url")
    val out = Urls.frontierMinusVisited(frontier, visited)
      .as[String].collect().toSet
    assert(out == Set("u1", "u3"))
  }

  test("Bloom route: no false negatives, and most new rows bypass the join") {
    val dir = "/root/testdata/sf0.001"
    val links = Urls.linkCorpus(spark, dir)
      .withColumn("norm_url", Urls.normalizeUrl(col("url")))
    val visited = links.filter(col("link_id") % 3 === 0).select("norm_url")
    val visitedSet = visited.as[String].collect().toSet
    val routed = Urls.bloomRoute(links, visited)
      .select("norm_url", "maybe_visited").as[(String, Boolean)].collect()
    // Bloom guarantee: a visited URL is never flagged definitely-new
    assert(routed.forall { case (u, maybe) => !visitedSet.contains(u) || maybe })
    // routing selectivity: ≥90% of truly-new rows skip the anti-join
    // (2^20 bits vs ~500 keys ⇒ FP ≈ 0 at this SF)
    val fresh = routed.filter { case (u, _) => !visitedSet.contains(u) }
    val bypassed = fresh.count(!_._2)
    assert(bypassed * 10 >= fresh.length * 9,
      s"bloom bypassed only $bypassed of ${fresh.length} new rows")
  }
}
