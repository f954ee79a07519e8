package graft.etl

import java.util.zip.Inflater

/** Minimal self-contained PDF text extractor — the REAL implementation
  * behind the S9 landing-zone contract (reference semantics:
  * config/limits.yaml:91-92 caps PDF processing at max_pages=15;
  * DESIGN.md:686-696 describes the capture→extract flow). Pure JVM,
  * zero dependencies: parses the object table lexically ("N G obj …
  * endobj"), inflates FlateDecode streams, walks the /Type /Page
  * objects in document order, and tokenizes the text-showing operators
  * (Tj, TJ, ', ") of each page's /Contents streams — literal strings
  * with the full escape set (\n \r \t \b \f \( \) \\ \ooo, line
  * continuations) and hex strings included.
  *
  * Robustness contract: this handles the PDFs a crawler actually lands
  * (Flate or plain content streams); exotic filters (DCT, LZW,
  * encryption) and malformed files yield empty text — never a thrown
  * task failure, because one bad asset must not kill a 100 TB stage.
  * The per-page cap bounds worst-case work per row regardless of asset
  * size, which is what makes the operator safe to run inside a
  * partition over arbitrary crawled bytes.
  */
object PdfText extends Serializable {

  final case class Extraction(pages: Int, text: String)

  private val ObjRe = """(?s)(\d+)\s+\d+\s+obj(.*?)endobj""".r
  private val PageTypeRe = """/Type\s*/Page(?![a-zA-Z])""".r
  private val ContentsRe =
    """/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)""".r
  private val RefRe = """(\d+)\s+\d+\s+R""".r

  /** Extract page count and the text of the first `maxPages` pages.
    * Never throws; non-PDF or unparseable input → Extraction(0, "").
    */
  def extract(bytes: Array[Byte], maxPages: Int = 15): Extraction = {
    try {
      if (bytes == null || bytes.length < 5) return Extraction(0, "")
      // ISO-8859-1 is byte-faithful: offsets in this string ARE byte
      // offsets, so stream payloads survive the round-trip intact.
      val raw = new String(bytes, "ISO-8859-1")
      if (!raw.startsWith("%PDF")) return Extraction(0, "")
      val objList = ObjRe.findAllMatchIn(raw)
        .map(m => m.group(1).toInt -> m.group(2)).toList
      val objMap = objList.toMap // later definitions win (incremental updates)
      val pageBodies = objList.collect {
        case (_, body) if PageTypeRe.findFirstIn(body).isDefined => body
      }
      if (pageBodies.isEmpty) {
        // degenerate PDFs without a parseable page tree: best-effort
        // over every stream in the file, counted as one page
        val all = objList.flatMap(o => streamOf(o._2))
          .map(b => showText(new String(b, "ISO-8859-1")))
          .filter(_.nonEmpty).mkString("\n\n")
        return Extraction(if (all.nonEmpty) 1 else 0, all)
      }
      val texts = pageBodies.take(maxPages).map { pb =>
        contentRefs(pb).flatMap(objMap.get).flatMap(streamOf)
          .map(b => showText(new String(b, "ISO-8859-1")))
          .filter(_.nonEmpty).mkString(" ")
      }
      Extraction(pageBodies.size, texts.filter(_.nonEmpty).mkString("\n\n").trim)
    } catch { case _: Exception => Extraction(0, "") }
  }

  /** /Contents refs of a page object: single "N G R" or an array. */
  private def contentRefs(pageBody: String): List[Int] =
    ContentsRe.findFirstMatchIn(pageBody).toList.flatMap(m =>
      RefRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toList)

  /** Raw (inflated if /FlateDecode) stream payload of an object. */
  private def streamOf(body: String): Option[Array[Byte]] = {
    val si = body.indexOf("stream")
    if (si < 0) return None
    var s = si + "stream".length
    if (s < body.length && body.charAt(s) == '\r') s += 1
    if (s < body.length && body.charAt(s) == '\n') s += 1
    val e = body.indexOf("endstream", s)
    if (e < 0) return None
    val data = body.substring(s, e).getBytes("ISO-8859-1")
    try {
      if (body.substring(0, si).contains("/FlateDecode")) Some(inflate(data))
      else Some(data)
    } catch { case _: Exception => None }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    var stalled = false
    while (!inf.finished() && !stalled) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (inf.needsInput() || inf.needsDictionary()) stalled = true
    }
    inf.end()
    out.toByteArray
  }

  /** Tokenize a content stream and collect the strings consumed by the
    * show-text operators. Strings not claimed by a show op are dropped
    * at the next BT/ET boundary.
    */
  private def showText(content: String): String = {
    val sb = new StringBuilder
    val pending = new StringBuilder
    val n = content.length
    var i = 0

    def flush(): Unit =
      if (pending.nonEmpty) {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(pending)
        pending.setLength(0)
      }

    // PDF 2.0 UTF-8 text strings (ISO 32000-2 §7.9.2.2): a string whose
    // decoded bytes start with the EF BB BF BOM carries UTF-8 — re-decode
    // the byte-chars accumulated since `p0` and strip the BOM. Chars
    // > 0xFF in the region mean it wasn't a byte string; leave it alone.
    def decodeBom(p0: Int): Unit = {
      val len = pending.length - p0
      if (len >= 3 && pending.charAt(p0) == 0xEF.toChar &&
          pending.charAt(p0 + 1) == 0xBB.toChar &&
          pending.charAt(p0 + 2) == 0xBF.toChar) {
        val bytes = new Array[Byte](len - 3)
        var k = p0 + 3
        var ok = true
        while (k < pending.length && ok) {
          val c = pending.charAt(k)
          if (c > 0xFF) ok = false else bytes(k - p0 - 3) = c.toByte
          k += 1
        }
        if (ok) {
          pending.setLength(p0)
          pending.append(
            new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    }

    def parseLiteral(start: Int): Int = { // content(start) == '('
      val p0 = pending.length
      var depth = 1
      var j = start + 1
      while (j < n && depth > 0) {
        content.charAt(j) match {
          case '\\' if j + 1 < n =>
            content.charAt(j + 1) match {
              case 'n' => pending.append('\n'); j += 2
              case 'r' => pending.append('\r'); j += 2
              case 't' => pending.append('\t'); j += 2
              case 'b' => pending.append('\b'); j += 2
              case 'f' => pending.append('\f'); j += 2
              case c @ ('(' | ')' | '\\') => pending.append(c); j += 2
              case c if c >= '0' && c <= '7' =>
                var k = j + 1; var v = 0; var cnt = 0
                while (k < n && cnt < 3 && content.charAt(k) >= '0'
                    && content.charAt(k) <= '7') {
                  v = v * 8 + (content.charAt(k) - '0'); k += 1; cnt += 1
                }
                pending.append(v.toChar); j = k
              case '\n' => j += 2 // line continuation
              case '\r' => j += 2
                if (j < n && content.charAt(j) == '\n') j += 1
              case c => pending.append(c); j += 2
            }
          case '(' => depth += 1; pending.append('('); j += 1
          case ')' => depth -= 1; if (depth > 0) pending.append(')'); j += 1
          case c => pending.append(c); j += 1
        }
      }
      decodeBom(p0)
      j
    }

    def parseHex(start: Int): Int = { // '<' (not '<<')
      val p0 = pending.length
      var j = start + 1
      val hx = new StringBuilder
      while (j < n && content.charAt(j) != '>') {
        val c = content.charAt(j)
        if (!Character.isWhitespace(c)) hx.append(c)
        j += 1
      }
      if (hx.length % 2 == 1) hx.append('0')
      var k = 0
      while (k + 1 < hx.length) {
        pending.append(Integer.parseInt(hx.substring(k, k + 2), 16).toChar)
        k += 2
      }
      decodeBom(p0)
      j + 1
    }

    while (i < n) {
      content.charAt(i) match {
        case '(' => i = parseLiteral(i)
        case '<' if i + 1 < n && content.charAt(i + 1) == '<' => i += 2
        case '<' => i = parseHex(i)
        case 'T' if i + 1 < n &&
            (content.charAt(i + 1) == 'j' || content.charAt(i + 1) == 'J') =>
          flush(); i += 2
        case '\'' | '"' => flush(); i += 1
        case 'B' if content.startsWith("BT", i) => pending.setLength(0); i += 2
        case 'E' if content.startsWith("ET", i) => pending.setLength(0); i += 2
        case _ => i += 1
      }
    }
    sb.toString.trim
  }
}
