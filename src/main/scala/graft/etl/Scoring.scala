package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Page-level relevance scoring and content classification over the
  * `documents` table (the reference's page analog — FIXTURES.md §1).
  *
  * Operators (SURVEY.md §2.2/§2.3):
  *  - X2 score_page      (relevance-scorer SKILL.md:124-155)
  *  - X4 relevance→stars (crawler-summarizer.md:346-354)
  *  - F6 obstacle detect (DESIGN.md:780-852)
  *  - F10 content flags  (DESIGN.md:1296-1312)
  *  - X7 truncate+notice (DESIGN.md:983-996)
  *
  * All pure Column expressions (rlike / regexp_extract_all / when):
  * codegen'd, pushdown-safe, no UDFs. Topic regexes are parameters in the
  * reference (`--topic`); the constants below instantiate them for the
  * synthetic corpus while keeping the reference's weight structure.
  */
object Scoring {

  /** Topic regex for the synthetic document corpus. Restricted to the
    * Java∩RE2 dialect so DuckDB oracles agree (SURVEY.md §7.4).
    */
  val PageTopic = "spark|window|stream"

  private def txt(c: Column): Column = coalesce(c, lit(""))

  /** Number of topic mentions in the body. */
  def mentionCount(text: Column, topic: String): Column =
    size(regexp_extract_all(txt(text), lit(topic), lit(0)))

  /** X2: page relevance 0-10 = title match (+3) + mention-density tier
    * (≥10→+3, ≥5→+2, ≥2→+1), capped at 10. The reference's heading term
    * has no analog in `documents` (no markdown headings); the heading
    * variant is exercised by `heading_extract` (G3) instead.
    * "Title" = first 40 chars of the body, per the page-frontmatter analog.
    */
  def scorePage(text: Column, topic: String): Column = {
    val title = substring(txt(text), 1, 40)
    val mentions = mentionCount(text, topic)
    least(lit(10),
      when(title.rlike(topic), 3).otherwise(0)
        + when(mentions >= 10, 3)
          .when(mentions >= 5, 2)
          .when(mentions >= 2, 1)
          .otherwise(0)).cast("int")
  }

  def scorePageQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        mentionCount(col("text"), PageTopic).as("mentions"),
        scorePage(col("text"), PageTopic).as("relevance"))
      .orderBy("doc_id")

  // ---- X4: relevance score → star-glyph bucket ----
  def stars(relevance: Column): Column =
    when(relevance >= 9, "*****")
      .when(relevance >= 7, "****")
      .when(relevance >= 5, "***")
      .when(relevance >= 3, "**")
      .otherwise("*")

  def starsBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("relevance", scorePage(col("text"), PageTopic))
      .groupBy(stars(col("relevance")).as("stars"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("stars")

  // ---- F6: obstacle detector (priority chain of content predicates) ----
  // Reference chain: short/empty ⇒ ANTI_SCRAPE, then LOGIN_REQUIRED,
  // CAPTCHA, ANTI_SCRAPE patterns, else NONE (DESIGN.md:799-852).
  // Patterns are config in the reference; instantiated to corpus terms so
  // every branch is exercised on the synthetic tables.
  val LoginPattern   = "login|sign.?in|unauthorized|customer"
  val CaptchaPattern = "captcha|verify|vector"
  val AntiScrapePattern = "cloudflare|checking.+browser|slow.+slow"

  def obstacleType(text: Column): Column = {
    val t = txt(text)
    when(length(t) < 100, "ANTI_SCRAPE")
      .when(t.rlike(LoginPattern), "LOGIN_REQUIRED")
      .when(t.rlike(CaptchaPattern), "CAPTCHA")
      .when(t.rlike(AntiScrapePattern), "ANTI_SCRAPE")
      .otherwise("NONE")
  }

  def obstacleRecoverable(obstacle: Column): Column =
    obstacle.isin("CAPTCHA", "ANTI_SCRAPE")

  def obstacleDetect(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("obstacle", obstacleType(col("text")))
      .select(col("doc_id"), col("obstacle"),
        (obstacleRecoverable(col("obstacle")) && col("obstacle") =!= "NONE")
          .as("recoverable"))
      .orderBy("doc_id")

  // ---- F6 routing: obstacle → quarantine (DESIGN.md:855-916) ----
  // The reference BLOCKS on AskUser when an obstacle is hit; the batch
  // analog routes the row to a needs-attention sink with the action the
  // user would have been asked to take (SURVEY §2.11 mapping). Pure
  // expressions here; Sinks.writeRouted does the single-pass split write.
  def suggestedAction(obstacle: Column): Column =
    when(obstacle === "LOGIN_REQUIRED", "provide_credentials")
      .when(obstacle === "CAPTCHA", "solve_manually")
      .when(obstacle === "ANTI_SCRAPE", "retry_with_backoff")
      .otherwise("none")

  def routeFor(obstacle: Column): Column =
    when(obstacle === "NONE", "clean").otherwise("quarantine")

  def obstacleRoute(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("obstacle", obstacleType(col("text")))
      .select(col("doc_id"), col("obstacle"),
        routeFor(col("obstacle")).as("route"),
        suggestedAction(col("obstacle")).as("suggested_action"))
      .orderBy("doc_id")

  // ---- F10: content feature flags ----
  // Reference: hasCode = /```/, hasTables = /\|.*\|/ — instantiated to
  // corpus-visible features, same rlike shape.
  def contentFlags(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        txt(col("text")).rlike("\\bjoin\\b").as("has_join"),
        txt(col("text")).rlike("\\bwindow\\b.*\\bwindow\\b").as("has_tables"),
        (length(txt(col("text"))) > 200).as("is_long"))
      .orderBy("doc_id")

  // ---- X7: truncate with notice ----
  // Cut at `limit` chars and append a marker carrying the original size
  // (content-safeguard SKILL.md:130-137). The notice keeps the audit
  // trail without unbounded content — the reference's iron rule.
  def truncateWithNotice(text: Column, limit: Int): Column = {
    val t = txt(text)
    when(length(t) > limit,
      concat(substring(t, 1, limit),
        lit(" [truncated "), length(t).cast("string"), lit(" chars]")))
      .otherwise(t)
  }

  def truncateNotice(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        truncateWithNotice(col("text"), 200).as("bounded_text"),
        length(truncateWithNotice(col("text"), 200)).as("bounded_len"))
      .orderBy("doc_id")
}
