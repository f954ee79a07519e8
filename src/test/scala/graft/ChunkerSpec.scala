package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.Chunker

class ChunkerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def chunksOf(text: String, size: Int = 100, overlap: Int = 20,
      maxChunks: Int = 50): Seq[(Int, String)] =
    Chunker.chunk(Seq((1L, text)).toDF("doc_id", "text"), col("text"),
        size, overlap, maxChunks)
      .select(col("chunk_idx"), col("chunk"))
      .as[(Int, String)].collect().toSeq.sortBy(_._1)

  test("G1: every chunk length <= size; consecutive chunks overlap exactly") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val cs = chunksOf(text)
    assert(cs.nonEmpty)
    assert(cs.forall(_._2.length <= 100))
    cs.sliding(2).foreach {
      case Seq((_, a), (_, b)) if a.length == 100 =>
        assert(a.takeRight(20) == b.take(20), "100-char chunks share a 20-char overlap")
      case _ =>
    }
  }

  test("G1: chunks reassemble the original text") {
    val text = "0123456789" * 47 // 470 chars
    val cs = chunksOf(text)
    val rebuilt = cs.head._2 + cs.tail.map(_._2.drop(20)).mkString
    assert(rebuilt == text)
  }

  test("G1: short and empty docs yield exactly one chunk") {
    assert(chunksOf("tiny") == Seq((0, "tiny")))
    assert(chunksOf("") == Seq((0, "")))
    assert(chunksOf("x" * 100) == Seq((0, "x" * 100))) // == size: one chunk
  }

  test("G1b: markdown-aware split cuts at heading boundaries first") {
    val md = "# Title\nintro text here\n## Section A\n" + ("a" * 50) +
      "\n### Sub\n" + ("b" * 30)
    val out = Chunker.chunkMarkdown(
        Seq((1L, md)).toDF("doc_id", "text"), col("text"), 60, 10)
      .select(col("section"), col("chunk"))
      .as[(String, String)].collect().toSeq
    val sections = out.map(_._1).distinct
    assert(sections.size == 3, s"3 heading sections, got: $sections")
    assert(sections.forall(s => s.startsWith("#")))
    assert(out.forall(_._2.length <= 60))
  }

  test("G1c: fenced code blocks are never split, prose still chunks") {
    val code = "val x = 1\n" * 30                  // 300 chars of "code"
    val md = ("p" * 250) + "\n```\n" + code + "```\n" + ("q" * 180)
    val out = Chunker.chunkCodeAware(
        Seq((1L, md)).toDF("doc_id", "text"), col("text"), 100, 20)
      .select(col("seg_idx"), col("chunk_idx"), col("is_code"), col("chunk"))
      .as[(Int, Int, Boolean, String)].collect().toSeq
      .sortBy(t => (t._1, t._2))
    // no chunk ever contains an unbalanced fence
    assert(out.forall { case (_, _, isCode, c) =>
      val fences = c.sliding(3).count(_ == "```")
      if (isCode) fences == 2 else fences == 0
    })
    // the whole code block, longer than `size`, is exactly one chunk
    val codeChunks = out.filter(_._3)
    assert(codeChunks.size == 1)
    assert(codeChunks.head._4 == "```\n" + code + "```")
    assert(codeChunks.head._4.length > 100)
    // prose on both sides still size-chunks (251 and 181 chars -> 3 each at step 80)
    assert(out.count(t => t._1 == 0 && !t._3) == 3)
    assert(out.count(t => t._1 == 2 && !t._3) == 3)
    assert(out.filter(!_._3).forall(_._4.length <= 100))
  }

  test("G1: chunk count is capped at maxChunks") {
    val cs = chunksOf("z" * 100000, maxChunks = 50)
    assert(cs.size == 50)
  }

  test("G1: boundary — one char past a full chunk starts a second chunk") {
    val cs = chunksOf("x" * 81, size = 100, overlap = 20)
    assert(cs.size == 1) // starts: 0 only (81 - 20 = 61 <= 80)
    val cs2 = chunksOf("x" * 121, size = 100, overlap = 20)
    assert(cs2.size == 2)
    assert(cs2(1)._2.length == 41) // second chunk covers chars 81..121
  }
}
