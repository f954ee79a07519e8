package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._

/** Sink surface (SURVEY.md §2.10, K1-K11): the relational sinks write
  * distributed (parquet/json, partitioned); the human-readable renders
  * (INDEX.md/REPORT.md analogs) run DRIVER-SIDE over already-aggregated,
  * bounded results — never over raw rows. That split is the reference's
  * own architecture rule (coordinator never reads page bodies) mapped
  * to Spark: executors own data, the driver formats a bounded summary.
  */
object Sinks {

  /** K1: page store — parquet partitioned by language (the analog of
    * pages/{id}.md with frontmatter columns). Partition column choice =
    * low-cardinality attribute so files stay chunky at scale.
    */
  def writePages(pages: DataFrame, path: String): Unit =
    pages.write.mode(SaveMode.Overwrite)
      .partitionBy("lang").parquet(path)

  /** K2: per-page scored links as JSON lines. */
  def writeLinks(links: DataFrame, path: String): Unit =
    links.write.mode(SaveMode.Overwrite).json(path)

  /** K8: RAG chunk store (the one purely relational sink in the
    * reference: chunks/chunk_NNN.json).
    */
  def writeChunks(chunks: DataFrame, path: String): Unit =
    chunks.write.mode(SaveMode.Overwrite).json(path)

  /** Obstacle → quarantine split writer (DESIGN.md:855-916): rows with a
    * detected obstacle land in a needs-attention store carrying the
    * `suggested_action` a human reviewer applies; clean rows go to the
    * page store. ONE pass over the input — `partitionBy(route)` makes the
    * writer do the split (route=clean/ route=quarantine/ directories),
    * never two filtered scans of a 100 TB source.
    */
  def writeRouted(pages: DataFrame, textCol: String, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    pages
      .withColumn("obstacle", Scoring.obstacleType(col(textCol)))
      .withColumn("route", Scoring.routeFor(col("obstacle")))
      .withColumn("suggested_action", Scoring.suggestedAction(col("obstacle")))
      .write.mode(mode)
      .partitionBy("route").parquet(path)

  /** K11: state checkpoint between crawl iterations — overwrite-parquet
    * (the batch analog of the reference's tmp-file-then-mv atomicity;
    * streaming uses real checkpoints).
    */
  def checkpointState(state: DataFrame, path: String): Unit =
    state.write.mode(SaveMode.Overwrite).parquet(path)

  /** K5: SKILL.md render (frontmatter + bounded overview + concept
    * table), capped at 30K chars — output-transformer.md:139-211,438.
    */
  def renderSkill(topic: String, overview: String,
      concepts: Seq[(String, String)], maxChars: Int = 30000): String = {
    val sb = new StringBuilder
    sb.append(s"---\nname: $topic\ndescription: ${overview.take(500)}\n---\n\n")
    sb.append(s"# $topic\n\n${overview.take(500)}\n\n## Concepts\n\n")
    sb.append("| concept | summary |\n|---|---|\n")
    concepts.iterator.takeWhile(_ => sb.length < maxChars - 200).foreach {
      case (name, summary) => sb.append(s"| $name | ${summary.take(200)} |\n")
    }
    sb.toString.take(maxChars)
  }

  /** K7: system-prompt render, hard-capped at 20K chars. */
  def renderPrompt(topic: String, sections: Seq[String], maxChars: Int = 20000): String =
    (s"You are an expert on $topic.\n\n" +
      sections.map(s => s.take(2000)).mkString("\n\n")).take(maxChars)

  /** K10: single knowledge.json object (concepts/use_cases/references). */
  def renderKnowledgeJson(topic: String, source: String,
      concepts: Seq[String], useCases: Seq[String], references: Seq[String]): String = {
    def esc(x: String) =
      "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def arr(xs: Seq[String]) = xs.map(esc).mkString("[", ",", "]")
    s"""{"topic":${esc(topic)},"source":${esc(source)},"concepts":${arr(concepts)},""" +
      s""""use_cases":${arr(useCases)},"references":${arr(references)}}"""
  }

  /** K4: REPORT.md render — top-k pages with bounded key points,
    * ≤30K chars with the reference's degradation rule (fewer chars per
    * page once over budget).
    */
  def renderReport(topic: String, pages: Seq[(String, Int, String)],
      maxChars: Int = 30000): String = {
    val sb = new StringBuilder(s"# REPORT: $topic\n\n")
    val perPage = if (pages.size > 8) 300 else 500
    pages.iterator.takeWhile(_ => sb.length < maxChars - perPage - 50).foreach {
      case (title, relevance, summary) =>
        sb.append(s"## $title (relevance $relevance)\n\n${summary.take(perPage)}\n\n")
    }
    val shown = sb.toString
    if (pages.size > 8) shown + s"\n_(degraded: ${pages.size} pages)_\n" else shown
  }

  /** K6/K9: plugin/docs multi-file renders — a name → content map the
    * caller writes out (driver-side, all inputs bounded).
    */
  def renderPluginFiles(name: String, skillMd: String): Map[String, String] =
    Map(
      "plugin.json" ->
        ("{\"name\":\"" + name + "\",\"skills\":[\"skills/" + name + "/SKILL.md\"]}"),
      s"skills/$name/SKILL.md" -> skillMd,
      "README.md" -> s"# $name\n\nGenerated knowledge plugin.\n")

  def renderDocsFiles(topic: String, overview: String,
      sections: Seq[(String, String)]): Map[String, String] =
    Map("README.md" -> s"# $topic\n\n${overview.take(2000)}\n",
      "getting-started.md" -> s"# Getting started with $topic\n") ++
      sections.map { case (n, body) =>
        s"reference/$n.md" -> body.take(5000)
      }.toMap

  /** K3: INDEX.md render — driver-side, from BOUNDED aggregated inputs
    * (stats rows ≤ |languages|, page rows ≤ top-k). Returns markdown.
    */
  def renderIndex(stats: Seq[Row], topPages: Seq[Row]): String = {
    val sb = new StringBuilder
    sb.append("# INDEX\n\n## Stats\n\n")
    sb.append("| lang | pages | max_chars | total_chars |\n|---|---|---|---|\n")
    stats.foreach { r =>
      sb.append(s"| ${r.getAs[Any]("lang")} | ${r.getAs[Any]("n_pages")} " +
        s"| ${r.getAs[Any]("max_chars")} | ${r.getAs[Any]("total_chars")} |\n")
    }
    sb.append("\n## Top pages\n\n| doc | lang | relevance |\n|---|---|---|\n")
    topPages.foreach { r =>
      sb.append(s"| ${r.getAs[Any]("doc_id")} | ${r.getAs[Any]("lang")} " +
        s"| ${r.getAs[Any]("relevance")} |\n")
    }
    sb.toString
  }
}
