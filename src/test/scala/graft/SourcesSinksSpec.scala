package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.etl.{Sinks, Sources}
import graft.streaming.{PageVisit, StreamingOps}

class SourcesSinksSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmpDir(): Path = Files.createTempDirectory("graft_test_")

  test("S11: state-file readers parse the documented shapes with explicit schemas") {
    val d = tmpDir()
    Files.writeString(d.resolve("queue.json"),
      """{"url":"https://a.com/x","depth":1,"priority":7,"parent_id":"001","anchor_text":"x"}
        |{"url":"https://a.com/y","depth":2,"priority":3,"parent_id":"001","anchor_text":"y"}""".stripMargin)
    val q = Sources.readQueue(spark, d.resolve("queue.json").toString)
    assert(q.schema == Sources.QueueSchema)
    assert(q.count() == 2)
    assert(q.filter($"priority" === 7).select("url").as[String].head()
      == "https://a.com/x")

    Files.writeString(d.resolve("links.json"),
      """{"page_id":"001","page_url":"https://a.com","page_relevance":8,
        |"links":[{"url":"https://a.com/1","anchor_text":"one","context":"c1","relevance_score":6},
        |{"url":"https://a.com/2","anchor_text":"two","context":"c2","relevance_score":2}]}"""
        .stripMargin.replaceAll("\n", ""))
    val l = Sources.readLinks(spark, d.resolve("links.json").toString)
    assert(l.count() == 2) // exploded
    assert(l.columns.toSeq ==
      Seq("page_id", "page_url", "page_relevance", "url", "anchor_text",
        "context", "relevance_score"))
  }

  test("K1/K8: partitioned page sink and chunk sink round-trip") {
    val d = tmpDir()
    val pages = Seq((1L, "en", "hello"), (2L, "de", "hallo"), (3L, "en", "hi"))
      .toDF("doc_id", "lang", "text")
    Sinks.writePages(pages, d.resolve("pages").toString)
    // partition dirs by language exist (K1 layout contract)
    assert(Files.exists(d.resolve("pages/lang=en")))
    val back = spark.read.parquet(d.resolve("pages").toString)
    assert(back.count() == 3)
    assert(back.filter($"lang" === "en").count() == 2)

    val chunks = Seq((1L, 0, "chunk a"), (1L, 1, "chunk b"))
      .toDF("doc_id", "chunk_idx", "chunk")
    Sinks.writeChunks(chunks, d.resolve("chunks").toString)
    assert(spark.read.json(d.resolve("chunks").toString).count() == 2)
  }

  test("S11 safe reader: a corrupt line becomes one quarantinable row, not a stage failure") {
    val d = tmpDir()
    Files.writeString(d.resolve("queue.json"),
      """{"url":"https://a.com/x","depth":1,"priority":7,"parent_id":"001","anchor_text":"x"}
        |{not json at all%%%
        |{"url":"https://a.com/y","depth":2,"priority":3,"parent_id":"001","anchor_text":"y"}""".stripMargin)
    val q = Sources.readQueueSafe(spark, d.resolve("queue.json").toString)
      .select("url", "priority", "_corrupt_record").cache()
    assert(q.count() == 3)
    val good = q.filter($"_corrupt_record".isNull)
    assert(good.count() == 2)
    assert(good.select("url").as[String].collect().toSet
      == Set("https://a.com/x", "https://a.com/y"))
    val bad = q.filter($"_corrupt_record".isNotNull)
    assert(bad.select("_corrupt_record").as[String].head()
      .startsWith("{not json"))
    assert(bad.select("url").as[String].collect().toSeq == Seq(null))
    q.unpersist()
  }

  test("F6 routing: obstacle rows split to quarantine with suggested_action in one write") {
    val d = tmpDir()
    val pages = Seq(
      (1L, "x" * 200 + " all fine and relaxed prose here"), // clean
      (2L, "x" * 150 + " please login to continue"),        // LOGIN_REQUIRED
      (3L, "short"),                                        // ANTI_SCRAPE (len)
      (4L, "x" * 150 + " solve this captcha first"))        // CAPTCHA
      .toDF("doc_id", "text")
    Sinks.writeRouted(pages, "text", d.resolve("routed").toString)
    // the writer splits by route directory — no second scan of the input
    assert(Files.exists(d.resolve("routed/route=clean")))
    assert(Files.exists(d.resolve("routed/route=quarantine")))
    val back = spark.read.parquet(d.resolve("routed").toString)
    assert(back.filter($"route" === "clean").select("doc_id").as[Long]
      .collect().toSet == Set(1L))
    val q = back.filter($"route" === "quarantine")
      .select("doc_id", "suggested_action").as[(Long, String)].collect().toMap
    assert(q == Map(2L -> "provide_credentials", 3L -> "retry_with_backoff",
      4L -> "solve_manually"))
  }

  test("K3: INDEX render is bounded and driver-side") {
    import org.apache.spark.sql.Row
    val stats = Seq(Row("en", 10L, 500L, 2000L))
    val schema = org.apache.spark.sql.types.StructType(
      Seq("lang", "n_pages", "max_chars", "total_chars").map(n =>
        org.apache.spark.sql.types.StructField(n,
          if (n == "lang") org.apache.spark.sql.types.StringType
          else org.apache.spark.sql.types.LongType)))
    val statsRows = spark.createDataFrame(
      spark.sparkContext.parallelize(stats), schema).collect().toSeq
    val md = Sinks.renderIndex(statsRows, Seq.empty)
    assert(md.contains("| en | 10 | 500 | 2000 |"))
    assert(md.startsWith("# INDEX"))
  }

  test("graftpages DSv2: typed page-store table with IO-pruning projection") {
    val d = tmpDir()
    Files.createDirectories(d.resolve("sub"))
    Files.writeString(d.resolve("alpha.md"),
      "---\ntitle: Alpha Page\nurl: https://example.com/a\n---\n# ignored\nbody text")
    Files.writeString(d.resolve("sub/beta.md"), "# Beta Heading\nmore body")
    Files.writeString(d.resolve("gamma.md"), "no title anywhere")
    Files.writeString(d.resolve("notes.txt"), "not markdown; excluded")

    val df = spark.read.format("graftpages").load(d.toString)
    val rows = df.select("slug", "title", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(
      ("alpha", "Alpha Page"),     // frontmatter wins
      ("beta", "Beta Heading"),    // first heading fallback
      ("gamma", "gamma")))         // slug fallback
    assert(df.count() == 3)        // .txt never listed

    // metadata-only projection: planner-visible IO pruning
    val slim = df.select("slug")
    val desc = slim.queryExecution.executedPlan.toString
    assert(desc.contains("metadata-only"),
      s"slug-only scan should skip file IO:\n$desc")
    assert(slim.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("alpha", "beta", "gamma"))

    // full read through SQL surface too
    df.createOrReplaceTempView("pages_v2")
    assert(spark.sql("SELECT sum(n_chars) FROM pages_v2").head.getLong(0) > 0)

    // slug filter pushdown prunes the FILE LIST at planning time
    val one = df.filter($"slug" === "alpha").select("slug", "title")
    val pdesc = one.queryExecution.executedPlan.toString
    assert(pdesc.contains("EqualTo(slug,alpha)"),
      s"slug filter not pushed to the source:\n$pdesc")
    assert(one.collect().map(_.getString(1)).toSeq == Seq("Alpha Page"))
  }

  test("graftpages DSv2 write: append + overwrite round-trip the store") {
    val d = tmpDir()
    Seq(("p1", "First Page", "hello body"), ("p2", "Second", "more text"))
      .toDF("slug", "title", "body")
      .write.format("graftpages").mode("append").save(d.toString)
    val r1 = spark.read.format("graftpages").load(d.toString)
    assert(r1.count() == 2)
    // titles round-trip through the written frontmatter
    assert(r1.select("slug", "title").as[(String, String)].collect().toSet ==
      Set("p1" -> "First Page", "p2" -> "Second"))
    assert(r1.filter($"slug" === "p1").select("body").as[String].head()
      .contains("hello body"))
    // no stray temp files after the rename commit
    val ls = Files.list(d)
    val stray =
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.count(_.toString.endsWith(".tmp"))
      } finally ls.close()
    assert(stray == 0)
    // overwrite truncates the previous store, then writes the new rows
    Seq(("p3", "Third", "fresh"))
      .toDF("slug", "title", "body")
      .write.format("graftpages").mode("overwrite").save(d.toString)
    val r2 = spark.read.format("graftpages").load(d.toString)
    assert(r2.select("slug").as[String].collect().toSeq == Seq("p3"))
  }

  test("gramprofile over a graftpages store: the real-corpus hook " +
       "profiles crawled pages, not just ScaleCheck replicas") {
    val d = tmpDir()
    // a 10-word shared span flanked by per-page words on BOTH sides:
    // the store round-trip glues markdown furniture (title header,
    // newlines) onto the adjacent token — the tokenizer splits on
    // single spaces only — so only INTERIOR grams survive identically.
    // Interior 8-grams of a 10-word clean span: exactly 3.
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      ("a", "A", s"aone $shared atail one two three four five six"),
      ("b", "B", s"bone $shared btail seven eight nine ten eleven twelve"),
      ("c", "C", "wholly unrelated text with no overlapping grams at all here"))
      .toDF("slug", "title", "body")
      .write.format("graftpages").mode("append").save(d.toString)
    val docs = ScaleCheck.pagesDocs(spark, d.toString)
    assert(docs.count() == 3)
    // stable ids: the slug hash is deterministic across reads
    val ids = docs.select("doc_id").as[Long].collect().toSet
    assert(ids.size == 3 &&
      ids == ScaleCheck.pagesDocs(spark, d.toString)
        .select("doc_id").as[Long].collect().toSet)
    val (nCross, totOcc, headOcc, shareBp) = ScaleCheck.gramProfile(docs)
    // the 3 interior shared 8-grams cross docs (pages a and b), once
    // per doc each; they ARE the head, so the share is 100%
    assert(nCross == 3L, s"nCross=$nCross")
    assert(totOcc == 6L && headOcc == 6L && shareBp == 10000L,
      s"($totOcc, $headOcc, $shareBp)")
    // a store with no cross-doc grams profiles to all-zero, not a crash
    val solo = ScaleCheck.gramProfile(docs.filter(!$"text".contains("alpha")))
    assert(solo == ((0L, 0L, 0L, 0L)), solo.toString)
  }

  test("graftpages DSv2 write: a failed task aborts without dirtying the store") {
    val d = tmpDir()
    Seq(("keep", "T", "original")).toDF("slug", "title", "body")
      .write.format("graftpages").mode("append").save(d.toString)
    // one partition containing a good row THEN a poisoned row: the task
    // writes the good tmp file, fails on the null slug, and must clean
    // up after itself — the job never commits
    val poisoned = Seq(("newpage", "N", "half"), (null, "X", "boom"))
      .toDF("slug", "title", "body").repartition(1)
    intercept[Exception] {
      poisoned.write.format("graftpages").mode("append").save(d.toString)
    }
    val ls = Files.list(d)
    val names =
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString).toSet
      } finally ls.close()
    // no tmp litter, no half-committed page; the prior store survives
    assert(names == Set("keep.md"), s"store dirtied: $names")
  }

  test("graftpages DSv2 write: duplicate slugs are rejected, store untouched") {
    val d = tmpDir()
    Seq(("keep", "T", "original")).toDF("slug", "title", "body")
      .write.format("graftpages").mode("append").save(d.toString)
    // same-task duplicate: write() fails fast (second tmp would shadow
    // the first and the driver's second rename of it would throw
    // mid-commit)
    intercept[Exception] {
      Seq(("dup", "A", "one"), ("dup", "B", "two"))
        .toDF("slug", "title", "body").repartition(1)
        .write.format("graftpages").mode("append").save(d.toString)
    }
    // cross-task duplicate under OVERWRITE: the driver must reject
    // BEFORE truncating — the prior store survives intact
    intercept[Exception] {
      Seq(("dup", "A", "one"), ("dup", "B", "two"))
        .toDF("slug", "title", "body")
        .repartitionByRange(2, $"title") // forces the dup into two tasks
        .write.format("graftpages").mode("overwrite").save(d.toString)
    }
    val ls = Files.list(d)
    val names =
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString).toSet
      } finally ls.close()
    assert(names == Set("keep.md"), s"store dirtied: $names")
  }

  test("S2: directory scan honors extension whitelist and excludes") {
    val d = tmpDir()
    Files.createDirectories(d.resolve("sub/node_modules"))
    Files.writeString(d.resolve("a.md"), "# doc a")
    Files.writeString(d.resolve("sub/b.txt"), "doc b")
    Files.writeString(d.resolve("sub/c.py"), "not included")
    Files.writeString(d.resolve("sub/node_modules/d.md"), "excluded")
    val got = Sources.scanDirectory(spark, d.toString)
      .select("body").as[String].collect().toSet
    assert(got == Set("# doc a", "doc b"))
  }

  test("X8: byte formatting tiers") {
    import org.apache.spark.sql.functions.col
    val got = Seq(512L, 2048L, 3145728L).toDF("b")
      .select(Sources.formatBytes(col("b"))).as[String].collect().toSeq
    assert(got == Seq("512 B", "2.0 KB", "3.0 MB"))
  }

  test("K4/K6/K9: report degradation and multi-file renders") {
    val many = (1 to 12).map(i => (s"page$i", 5, "s" * 1000))
    val report = Sinks.renderReport("topic", many)
    assert(report.length <= 30000)
    assert(report.contains("degraded: 12 pages"))
    assert(report.contains("s" * 300) && !report.contains("s" * 301))

    val plugin = Sinks.renderPluginFiles("kb", "# SKILL")
    assert(plugin.keySet == Set("plugin.json", "skills/kb/SKILL.md", "README.md"))
    assert(plugin("plugin.json").contains("\"skills/kb/SKILL.md\""))

    val docs = Sinks.renderDocsFiles("t", "over", Seq("api" -> "body"))
    assert(docs.keySet == Set("README.md", "getting-started.md", "reference/api.md"))
  }

  test("§2.11 gate: streaming obstacles route to quarantine across batches") {
    // the reference BLOCKS on AskUser mid-crawl; the streaming analog is
    // this non-blocking gate — each micro-batch splits obstacle rows into
    // the quarantine store and the crawl keeps moving
    implicit val sqlCtx = spark.sqlContext
    val d = tmpDir()
    val src = MemoryStream[(Long, String)]
    val q = src.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sinks.writeRouted(batch, "text", d.resolve("routed").toString,
          org.apache.spark.sql.SaveMode.Append)
      }
      .outputMode(OutputMode.Append()).start()
    try {
      src.addData((1L, "y" * 150 + " please login here"), (2L, "z" * 150))
      q.processAllAvailable()
      src.addData((3L, "tiny")) // second batch: short text obstacle
      q.processAllAvailable()
      val back = spark.read.parquet(d.resolve("routed").toString)
      val quarantined = back.filter($"route" === "quarantine")
        .select("doc_id", "suggested_action").as[(Long, String)]
        .collect().toMap
      assert(quarantined == Map(1L -> "provide_credentials",
        3L -> "retry_with_backoff"))
      assert(back.filter($"route" === "clean").select("doc_id").as[Long]
        .collect().toSeq == Seq(2L))
    } finally q.stop()
  }

  test("U2 streaming: flatMapGroupsWithState emits each url once") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[PageVisit]
    src.addData(PageVisit("u1", 1), PageVisit("u2", 2), PageVisit("u1", 3))
    val q = StreamingOps.visitedFirstSeen(src.toDS())
      .writeStream.format("memory").queryName("visited_t")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      src.addData(PageVisit("u1", 4), PageVisit("u3", 5))
      q.processAllAvailable()
      val urls = spark.table("visited_t").select("url").as[String]
        .collect().toSeq.sorted
      assert(urls == Seq("u1", "u2", "u3"))
    } finally q.stop()
  }
}
