package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{Pipeline, Transport}

/** End-to-end: frontier urls → route → fetch (stub transport) → score →
  * quarantine split → chunks → INDEX.md. One run produces every
  * artifact class the reference writes.
  */
class PipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private object PageTransport extends Transport {
    override def fetch(url: String, engine: String): (String, String) =
      if (url.contains("/fail/")) throw new IllegalStateException("net")
      else if (url.contains("/auth/"))
        ("ok", "x" * 150 + " please login to continue") // quarantine bait
      else
        ("ok", ("spark window stream " * 30) +
          s"\n```\nval page = \"$url\"\n```\n" + ("body text " * 20))
  }

  test("streaming pipeline fetches each frontier batch into the routed store") {
    val base = Files.createTempDirectory("graft_spipe_")
    val frontier = base.resolve("frontier"); Files.createDirectories(frontier)
    val out = base.resolve("out").toString
    Files.writeString(frontier.resolve("wave1.txt"),
      "https://building.example.com/page/1\nhttps://machinery.example.com/auth/2\n")
    val q = Pipeline.runStream(spark, frontier.toString, PageTransport, out)
    try {
      q.processAllAvailable()
      // second wave arrives while the stream runs
      Files.writeString(frontier.resolve("wave2.txt"),
        "https://furniture.example.com/page/3\n")
      q.processAllAvailable()
      val pages = spark.read.parquet(s"$out/pages")
      assert(pages.count() == 3)
      assert(pages.filter($"route" === "quarantine")
        .select("url").as[String].collect().toSeq
        == Seq("https://machinery.example.com/auth/2"))
      // both waves' clean pages landed, each scored from its fetched body
      assert(pages.filter($"route" === "clean" && $"relevance" > 0).count() == 2)
    } finally q.stop()
  }

  test("streaming pipeline restart resumes from checkpoint without re-fetching") {
    val base = Files.createTempDirectory("graft_spipe_rs_")
    val frontier = base.resolve("frontier"); Files.createDirectories(frontier)
    val out = base.resolve("out").toString
    Files.writeString(frontier.resolve("wave1.txt"),
      "https://building.example.com/page/1\n")
    val q1 = Pipeline.runStream(spark, frontier.toString, PageTransport, out)
    try q1.processAllAvailable() finally q1.stop()
    // new query, same checkpoint: wave1 must not be re-processed
    Files.writeString(frontier.resolve("wave2.txt"),
      "https://building.example.com/page/2\n")
    val q2 = Pipeline.runStream(spark, frontier.toString, PageTransport, out)
    try {
      q2.processAllAvailable()
      val pages = spark.read.parquet(s"$out/pages")
      assert(pages.count() == 2, "restart must neither drop nor duplicate pages")
      assert(pages.select("url").as[String].collect().toSet
        == Set("https://building.example.com/page/1",
          "https://building.example.com/page/2"))
    } finally q2.stop()
  }

  test("pipeline produces pages, quarantine, whole-fence chunks, and INDEX") {
    val d = Files.createTempDirectory("graft_pipe_").toString
    val frontier = Seq(
      "https://building.example.com/page/1",
      "https://building.example.com/page/2",
      "https://machinery.example.com/auth/3",
      "https://furniture.example.com/fail/4").toDF("url")

    val index = Pipeline.run(spark, frontier, PageTransport, d)

    val pages = spark.read.parquet(s"$d/pages")
    // error row dropped; auth page quarantined with its action; rest clean
    assert(pages.count() == 3)
    val quarantined = pages.filter($"route" === "quarantine")
      .select("url", "suggested_action").as[(String, String)].collect().toSeq
    assert(quarantined ==
      Seq("https://machinery.example.com/auth/3" -> "provide_credentials"))
    val clean = pages.filter($"route" === "clean")
    assert(clean.count() == 2)
    // frontmatter travels with the content into the page store
    assert(clean.select("page_md").as[String].collect()
      .forall(_.startsWith("---\nurl: https://")))
    // relevance scored the fetched body (topic terms present => > 0)
    assert(clean.filter($"relevance" > 0).count() == 2)

    // chunks: prose chunked, fenced block intact in exactly one chunk
    val chunks = spark.read.json(s"$d/chunks")
    assert(chunks.count() > 4) // prose spans several chunks per page
    val fenced = chunks.filter($"chunk".contains("```"))
      .select("chunk").as[String].collect()
    assert(fenced.length == 2) // one whole code chunk per clean page
    assert(fenced.forall(c => c.sliding(3).count(_ == "```") == 2))

    // INDEX.md renders the bounded aggregates
    assert(index.startsWith("# INDEX"))
    assert(index.contains("| en | 2 |"))
  }

  test("pipeline end-to-end over the real HTTP transport (loopback)") {
    val prose = ("spark window stream " * 30) +
      "\n```\nval page = \"served\"\n```\n" + ("body text " * 20)
    Loopback.withServer { srv =>
      srv.route("/page/") { ex => Loopback.respond(ex, 200, prose.getBytes) }
      srv.route("/auth/3") { ex =>
        Loopback.respond(ex, 200, ("x" * 150 + " please login to continue").getBytes)
      }
      srv.route("/gone") { ex => Loopback.respond(ex, 404, Array.empty) }
      val d = Files.createTempDirectory("graft_pipe_http_").toString
      val frontier = Seq(
        srv.base + "/page/1", srv.base + "/page/2",
        srv.base + "/auth/3", srv.base + "/gone").toDF("url")
      val index = Pipeline.run(spark, frontier,
        new graft.etl.HttpTransport(srv.base + "/reader/{url}",
          maxAttempts = 2, initialDelayMs = 5, perHostIntervalMs = 0), d)
      val pages = spark.read.parquet(s"$d/pages")
      // 404 degraded to an error row and dropped; auth page quarantined
      assert(pages.count() == 3)
      assert(pages.filter($"route" === "quarantine").count() == 1)
      val clean = pages.filter($"route" === "clean")
      assert(clean.count() == 2 && clean.filter($"relevance" > 0).count() == 2)
      assert(index.startsWith("# INDEX") && index.contains("| en | 2 |"))
    }
  }

  test("corpus build: monotone stage funnel, deterministic, chunked output") {
    import graft.etl.CorpusPipeline
    val d1 = Files.createTempDirectory("graft_corpus1_").toString
    val r1 = CorpusPipeline.build(spark, "/root/testdata/sf0.001", d1)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val (nIn, nQ, nD, nE, nN, nCl, nEn, nS, nC) = r1
    // each stage only removes documents; chunking only adds rows
    assert(nIn >= nQ && nQ >= nD && nD >= nE && nE >= nN && nN >= nCl
      && nCl >= nEn && nEn >= nS, s"stage funnel must shrink: $r1")
    // the cap binds at this SF (25 docs/source input, cap 20)
    assert(nD < nQ, s"domain cap should bind at sf0.001: $r1")
    assert(nS > 0 && nC >= nS, s"survivors must chunk: $r1")
    // chunk store is partitioned by lang and readable
    val chunks = spark.read.parquet(s"$d1/chunks")
    assert(chunks.columns.toSet == Set("doc_id", "lang", "chunk_idx", "chunk"))
    assert(chunks.select("lang").distinct().count() >= 2)
    // deterministic: a second build reproduces the identical corpus
    val d2 = Files.createTempDirectory("graft_corpus2_").toString
    val r2 = CorpusPipeline.build(spark, "/root/testdata/sf0.001", d2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r1 == r2)
    val c1 = chunks.select("doc_id", "chunk_idx", "chunk")
      .as[(Long, Int, String)].collect().toSet
    val c2 = spark.read.parquet(s"$d2/chunks")
      .select("doc_id", "chunk_idx", "chunk")
      .as[(Long, Int, String)].collect().toSet
    assert(c1 == c2)
  }

  test("A3 enrichment boundary: a stub abstractive model composes with " +
       "summary_extract without touching verified columns or lifecycle") {
    import org.apache.spark.sql.functions.{col, concat, lit, md5}
    val dir = "/root/testdata/sf0.001"
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.size
    val stub: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column =
      d => concat(lit("covers "), col("keywords"), lit(" ["),
        org.apache.spark.sql.functions.substring(
          md5(col("doc_id").cast("string")), 1, 6), lit("]"))
    val enriched = graft.etl.Summaries.summarizeEnriched(spark, dir, stub)
    val base = graft.etl.Summaries.extractiveSummary(spark, dir)
    val baseCols = base.columns.toSeq
    assert(enriched.columns.toSeq ==
      baseCols ++ Seq("model_prose", "full_summary"))
    assert(enriched.select(baseCols.map(col): _*).collect().toSeq ==
      base.collect().toSeq)
    val rows = enriched.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[String]("model_prose")
      assert(p.startsWith("covers "), p)
      assert(r.getAs[String]("full_summary") ==
        s"$p — ${r.getAs[String]("summary")}")
    }
    assert(spark.sparkContext.getPersistentRDDs.size == pinnedBefore)
  }

  test("X11 enrichment boundary: a stub vision model composes with " +
       "image_describe without touching verified columns, plan shape, " +
       "or lifecycle") {
    import org.apache.spark.sql.functions.{col, concat, lit, md5, substring}
    val dir = "/root/testdata/sf0.001"
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.size
    // the stub "model": a deterministic hash-templated sentence wired
    // through the SAME DataFrame => Column contract a real batched
    // vision call would use (the only piece a deployment swaps)
    val stub: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column =
      d => concat(lit("depicts subject-"),
        substring(md5(col("asset_id").cast("string")), 1, 6))
    val enriched = graft.etl.Multimodal.describeEnriched(spark, dir, stub)
    val base = graft.etl.Multimodal.imageDescribe(spark, dir)
    // append-only: every verified column passes through byte-identical
    val baseCols = base.columns.toSeq
    assert(enriched.columns.toSeq ==
      baseCols ++ Seq("model_prose", "full_description"))
    assert(enriched.select(baseCols.map(col): _*).collect().toSeq ==
      base.collect().toSeq)
    // the composition contract: verified description + " — " + prose
    val rows = enriched.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[String]("description")
      val p = r.getAs[String]("model_prose")
      assert(p.startsWith("depicts subject-") && p.length > 16, p)
      assert(r.getAs[String]("full_description") == s"$d — $p")
    }
    // plan shape: enrichment is map-side — no added exchange
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        .linesIterator.count(_.contains("Exchange"))
    assert(exchanges(enriched) == exchanges(base),
      "the enrichment column must not add a shuffle")
    // lifecycle: nothing pinned by the composition
    assert(spark.sparkContext.getPersistentRDDs.size == pinnedBefore)
  }
}
