package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.HtmlExtract

/** S5 main-content extraction: tokenizer + jusText-class classifier.
  * Fixtures are adversarial (script islands containing markup, broken
  * tags, entity edge cases) — the extractor must degrade, never throw.
  */
class HtmlExtractSpec extends AnyFunSuite with SparkTestBase {

  private def main(html: String) = HtmlExtract.mainText(html)

  test("S5: boilerplate containers drop, content and headings survive") {
    val html =
      """<html><head><title>ignored</title></head><body>
        |<nav><a href="/">home</a> <a href="/a">about</a></nav>
        |<article><h1>The Title</h1>
        |<p>this paragraph has plenty of visible characters to keep</p>
        |<p>and a second one that likewise clears the minimum gate</p>
        |</article>
        |<aside>subscribe to our totally relevant newsletter today</aside>
        |<footer>copyright 2026 example inc all rights reserved</footer>
        |</body></html>""".stripMargin
    assert(main(html) ==
      "The Title\n" +
        "this paragraph has plenty of visible characters to keep\n" +
        "and a second one that likewise clears the minimum gate")
  }

  test("S5: link density kills a block even outside a kill-list container") {
    val html =
      "<body><div><a href='#'>share this</a> <a href='#'>tweet that</a> " +
        "<a href='#'>pin it now</a></div>" +
        "<p>a real paragraph with enough characters to be content</p></body>"
    assert(main(html) ==
      "a real paragraph with enough characters to be content")
    // an inline link INSIDE mostly-plain text is fine (density <= 1/3)
    val ok = "<p>read the <a href='/d'>docs</a> for the full story here</p>"
    assert(main(ok) == "read the docs for the full story here")
  }

  test("S5: entities decode; malformed entities degrade to literals") {
    val html = "<p>a &amp; b &lt;c&gt; &#65;&#x42; &nbsp; wide gate padding</p>"
    assert(main(html) == "a & b <c> AB wide gate padding")
    val bad = "<p>tom &zzz; jerry &#xZZ; & loose amp long enough to keep</p>"
    assert(main(bad) == "tom &zzz; jerry &#xZZ; & loose amp long enough to keep")
  }

  test("S5: script/style islands skip entirely, even containing markup") {
    val html =
      "<body><script>var x = '</p><p>not content</p>';</script>" +
        "<STYLE>p { color: red }</STYLE>" +
        "<P>upper-case tags parse the same as lower case ones</P></body>"
    assert(main(html) == "upper-case tags parse the same as lower case ones")
  }

  test("S5: comments skip; unterminated comment/script swallow the tail") {
    assert(main("<p>kept text long enough to pass the gate</p><!-- <p>no</p> -->")
      == "kept text long enough to pass the gate")
    assert(main("<p>kept text long enough to pass the gate</p><!-- oops")
      == "kept text long enough to pass the gate")
    assert(main("<p>kept text long enough to pass the gate</p><script>var x=1;")
      == "kept text long enough to pass the gate")
  }

  test("S5: whitespace collapses; inline tags never split a block") {
    val html = "<p>one\n\t two   <b>three</b>\n<span>four</span> five six seven</p>"
    assert(main(html) == "one two three four five six seven")
  }

  test("S5: block tags split; short non-heading fragments drop") {
    val html = "<p>tiny</p><p>this block is long enough to be kept as content</p>" +
      "<h2>Why</h2>"
    assert(main(html) == "this block is long enough to be kept as content\nWhy")
    assert(main("<div>alpha beta gamma delta epsilon zeta eta</div><br/>done") ==
      "alpha beta gamma delta epsilon zeta eta")
  }

  test("S5: malformed markup never throws") {
    for (h <- Seq("<<<>>>", "<div><p>unclosed paragraph text goes on and on here",
        "</nope>", "<a href='x", "<p", "", "&", "&#", "plain text only but quite long",
        "<nav><footer><nav>deep</nav></footer>after the mess it recovers fine ok",
        null)) {
      val out = main(h)   // must not throw
      assert(out != null)
    }
    // recovery after nested drop containers
    assert(main("<nav><footer><nav>deep</nav></footer></nav>" +
      "<p>after the mess this paragraph is happily recovered</p>") ==
      "after the mess this paragraph is happily recovered")
  }

  test("S5: round-trip — constructed pages recover exactly the planted content") {
    val rows = HtmlExtract.htmlExtract(spark, "/root/testdata/sf0.001")
      .limit(3).collect()
    assert(rows.length == 3)
    val first = rows.find(_.getLong(0) == 0L).get
    assert(first.getString(1).startsWith("Doc 0\nthe fast key order sort"))
    assert(first.getInt(2) >= 2)
  }
}
