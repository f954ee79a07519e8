package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.Scoring

class ScoringSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def scoreOf(text: String, topic: String = "spark|window"): Int =
    Seq(text).toDF("text")
      .select(Scoring.scorePage(col("text"), topic).as("s"))
      .head().getInt(0)

  test("X2: score is 0 for topic-free text") {
    assert(scoreOf("nothing relevant here at all") == 0)
  }

  test("X2: title match contributes +3") {
    // topic in first 40 chars, only 1 mention (below density tiers)
    assert(scoreOf("spark " + "x " * 50) == 3)
  }

  test("X2: density tiers add 1/2/3") {
    val far = "y " * 30 // pushes mentions out of the 40-char title window
    assert(scoreOf(far + "spark spark") == 1)          // >=2 mentions
    assert(scoreOf(far + "spark " * 5) == 2)           // >=5
    assert(scoreOf(far + "spark " * 12) == 3)          // >=10
  }

  test("X2: caps at 10 and never exceeds it for any input") {
    for (n <- Seq(0, 1, 2, 5, 10, 50, 200)) {
      val s = scoreOf("spark " * n)
      assert(s >= 0 && s <= 10, s"score $s out of range for n=$n")
    }
  }

  test("X2: null text scores 0") {
    val s = Seq[Option[String]](None).toDF("text")
      .select(Scoring.scorePage(col("text"), "spark").as("s")).head().getInt(0)
    assert(s == 0)
  }

  test("X4: stars buckets follow the >=9/7/5/3 thresholds") {
    val got = Seq(10, 9, 8, 7, 6, 5, 4, 3, 2, 0).toDF("r")
      .select(Scoring.stars(col("r")).as("st")).as[String].collect().toSeq
    assert(got == Seq("*****", "*****", "****", "****", "***", "***", "**", "**", "*", "*"))
  }

  test("F6: obstacle chain gives short-content priority over pattern matches") {
    val rows = Seq(
      "short login page",                       // <100 chars => ANTI_SCRAPE first
      ("x " * 60) + "customer area",            // long + login pattern
      ("x " * 60) + "vector graphics",          // long + captcha pattern
      ("x " * 60) + "slow and slow",            // long + anti-scrape pattern
      "x " * 60)                                // long, clean
      .toDF("text")
      .select(Scoring.obstacleType(col("text")).as("o")).as[String].collect().toSeq
    assert(rows == Seq("ANTI_SCRAPE", "LOGIN_REQUIRED", "CAPTCHA", "ANTI_SCRAPE", "NONE"))
  }

  test("X7: truncation never exceeds limit + notice and appends original size") {
    val long = "a" * 500
    val out = Seq(long).toDF("text")
      .select(Scoring.truncateWithNotice(col("text"), 100).as("t"))
      .as[String].head()
    assert(out.startsWith("a" * 100))
    assert(out.endsWith("[truncated 500 chars]"))
    assert(out.length <= 100 + " [truncated 500 chars]".length)
    val short = Seq("tiny").toDF("text")
      .select(Scoring.truncateWithNotice(col("text"), 100).as("t"))
      .as[String].head()
    assert(short == "tiny")
  }
}
