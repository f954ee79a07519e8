package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{BinaryTransport, Multimodal, Sources, Transport, Urls}

/** Deterministic local transport: proves the fetch operator's Spark-side
  * plumbing (lifecycle, dispatch, rate cap, landing zone) with zero
  * network. Counters are static — local-mode executors share the JVM.
  */
object StubTransport {
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  def reset(): Unit = { opens.set(0); closes.set(0) }
}

class StubTransport extends Transport {
  override def open(): Unit = StubTransport.opens.incrementAndGet()
  override def fetch(url: String, engine: String): (String, String) =
    if (url.contains("/fail/")) throw new IllegalStateException("boom")
    else ("ok", s"# page at $url\nextracted by $engine\n")
  override def close(): Unit = StubTransport.closes.incrementAndGet()
}

class FetchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def requests(urls: String*) =
    urls.toDF("url").withColumn("engine", Urls.engineFor($"url"))

  test("fetch: one transport open/close per partition, S6 dispatch, error rows") {
    StubTransport.reset()
    val reqs = requests(
      "https://machinery.example.com/page/1", // internal  → playwright
      "https://building.example.com/page/2",  // whitelist → jina
      "https://furniture.example.com/page/3", // default   → trafilatura
      "https://furniture.example.com/fail/4") // transport throws
      .repartition(2)
    val got = Sources.fetch(reqs, new StubTransport()).collect()
      .map(r => r.getAs[String]("url") ->
        (r.getAs[String]("engine"), r.getAs[String]("status"))).toMap
    assert(StubTransport.opens.get() == 2, "open() must run once per partition")
    assert(StubTransport.closes.get() == 2, "close() must run once per partition")
    assert(got("https://machinery.example.com/page/1")._1 == "playwright")
    assert(got("https://building.example.com/page/2")._1 == "jina")
    assert(got("https://furniture.example.com/page/3")._1 == "trafilatura")
    // a throwing fetch degrades to an error row, never a task failure
    assert(got("https://furniture.example.com/fail/4")._2
      == "error:IllegalStateException")
    assert(got.values.count(_._2 == "ok") == 3)
  }

  test("fetch: per-partition rate cap floors the inter-request interval") {
    val reqs = requests((1 to 4).map(i =>
      s"https://furniture.example.com/page/$i"): _*).repartition(1)
    val t0 = System.nanoTime()
    Sources.fetch(reqs, new StubTransport(), minIntervalMs = 40).count()
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    // 4 fetches in one partition with a 40ms floor => >= 3 waits
    assert(elapsedMs >= 120, s"rate cap not enforced: ${elapsedMs}ms")
  }

  test("S8: binary fetch downloads assets that magic-byte classify") {
    object AssetTransport extends BinaryTransport {
      override def fetch(url: String): (String, Array[Byte]) =
        if (url.endsWith(".jpg"))
          ("ok", Array(0xFF, 0xD8, 0xFF, 0xE0, 1, 2, 3).map(_.toByte))
        else if (url.endsWith(".png"))
          ("ok", Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A).map(_.toByte))
        else if (url.endsWith(".bin"))
          ("ok", Array(0x00, 0x01).map(_.toByte))
        else throw new java.io.IOException("404")
    }
    val urls = Seq("https://a.com/i.jpg", "https://a.com/i.png",
      "https://a.com/x.bin", "https://a.com/gone").toDF("url")
    val got = Sources.fetchBinary(urls, AssetTransport)
      .withColumn("kind", Multimodal.mediaKind(org.apache.spark.sql.functions.col("payload")))
      .select("url", "status", "n_bytes", "kind")
      .as[(String, String, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("https://a.com/i.jpg")._4 == "jpeg")
    assert(got("https://a.com/i.png")._4 == "png")
    assert(got("https://a.com/x.bin")._4 == "unknown")
    val gone = got("https://a.com/gone")
    assert(gone._2 == "error:IOException" && gone._3 == 0 && gone._4 == "empty")
    assert(got("https://a.com/i.jpg")._3 == 7)
  }

  test("S9: pdf payloads route by magic bytes into the extraction stage") {
    import org.apache.spark.sql.functions.col
    object PdfTransport extends BinaryTransport {
      override def fetch(url: String): (String, Array[Byte]) =
        if (url.endsWith(".pdf"))
          ("ok", ("%PDF-1.7 " + url).getBytes("UTF-8")) // 25 50 44 46 magic
        else ("ok", Array(0x00.toByte))
    }
    val assets = Sources.fetchBinary(
      Seq("https://a.com/spec.pdf", "https://a.com/other.x").toDF("url"),
      PdfTransport)
      .withColumn("kind", Multimodal.mediaKind(col("payload")))
    val pdfs = Multimodal.withPdfTextStub(
        assets.filter(col("kind") === "pdf"), col("payload"))
      .select("url", "pdf_pages", "pdf_text")
      .as[(String, Int, String)].collect()
    assert(pdfs.length == 1)
    assert(pdfs.head._1 == "https://a.com/spec.pdf")
    assert(pdfs.head._2 >= 1 && pdfs.head._2 <= 16)
    assert(pdfs.head._3.startsWith("pdf text 255044462D")) // hex(%PDF-)
  }

  test("fetch → frontmatter → landing zone → readLandingZone round trip") {
    val d = Files.createTempDirectory("graft_landing_")
    val reqs = requests(
      "https://machinery.example.com/page/1",
      "https://building.example.com/page/2",
      "https://furniture.example.com/fail/3")
    val fetched = Sources.fetch(reqs, new StubTransport())
    Sources.writeLandingZone(fetched, d.toString)
    val back = Sources.readLandingZone(spark, d.toString + "/*.md")
    val bodies = back.select("body").as[String].collect()
    assert(bodies.length == 2, "error row must not land")
    assert(bodies.forall(_.startsWith("---\nurl: https://")))
    assert(bodies.exists(b => b.contains("engine: playwright")
      && b.contains("extracted by playwright")))
    assert(bodies.exists(_.contains("engine: jina")))
  }
}
