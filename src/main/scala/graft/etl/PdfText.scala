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
  *
  * Round 19 (optimization guide §1.2 step 2, per-task work): the object
  * table, page detection and /Contents walks are single-pass index
  * scans over ONE byte-faithful Latin-1 view of the input — the round-16
  * regex passes (reluctant dotall object matcher plus three per-body
  * regexes) re-scanned every byte several times with per-char matcher
  * overhead, and each stream payload was substring-copied twice before
  * inflation. Stream payload bytes now slice straight out of the input
  * array (Latin-1 offsets ARE byte offsets), and the Inflater is a
  * reset-per-use thread-local — constructing a native zlib stream per
  * page dominated small-stream inflation. Semantics are unchanged and
  * pinned by the FetchSpec S9 round-trip and adversarial-escape tests.
  */
object PdfText extends Serializable {

  final case class Extraction(pages: Int, text: String)

  /** Java regex \s — the whitespace class the round-16 matchers used. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

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

      // Lexical object scan, equivalent to the former reluctant-dotall
      // regex (\d+)\s+\d+\s+obj(.*?)endobj: find each "obj" keyword
      // preceded by \d+\s+\d+\s+, take the shortest body to "endobj",
      // resume after it. Bodies are (start, end) offsets into raw —
      // no substring copies.
      val objNum = new java.util.ArrayList[Int]()
      val objBeg = new java.util.ArrayList[Int]()
      val objEnd = new java.util.ArrayList[Int]()
      var pos = 0
      var scanning = true
      while (scanning) {
        val o = raw.indexOf("obj", pos)
        if (o < 0) scanning = false
        else {
          // backward prefix check: \s+ digits+ \s+ digits+ ending at o
          var j = o - 1
          val w1 = j; while (j >= 0 && isWs(raw.charAt(j))) j -= 1
          val d1 = j; while (j >= 0 && isDigit(raw.charAt(j))) j -= 1
          val w2 = j; while (j >= 0 && isWs(raw.charAt(j))) j -= 1
          val d2 = j; while (j >= 0 && isDigit(raw.charAt(j))) j -= 1
          if (w1 > j && w1 != d1 && d1 != w2 && w2 != d2 && d2 != j) {
            val e = raw.indexOf("endobj", o + 3)
            if (e < 0) scanning = false // no body can close past here
            else {
              objNum.add(java.lang.Integer.parseInt(raw.substring(j + 1, d2 + 1)))
              objBeg.add(o + 3)
              objEnd.add(e)
              pos = e + 6
            }
          } else pos = o + 1
        }
      }
      val nObj = objNum.size()

      // later definitions win (incremental updates), as the old toMap did
      val byNum = new java.util.HashMap[Integer, java.lang.Long]()
      var i = 0
      while (i < nObj) {
        byNum.put(objNum.get(i), (objBeg.get(i).toLong << 32) | (objEnd.get(i).toLong & 0xFFFFFFFFL))
        i += 1
      }

      // /Type /Page objects in document order
      val pageBeg = new java.util.ArrayList[Int]()
      val pageEnd = new java.util.ArrayList[Int]()
      i = 0
      while (i < nObj) {
        if (isPageBody(raw, objBeg.get(i), objEnd.get(i))) {
          pageBeg.add(objBeg.get(i)); pageEnd.add(objEnd.get(i))
        }
        i += 1
      }

      if (pageBeg.isEmpty) {
        // degenerate PDFs without a parseable page tree: best-effort
        // over every stream in the file, counted as one page
        val sb = new StringBuilder
        i = 0
        while (i < nObj) {
          val t = streamText(bytes, raw, objBeg.get(i), objEnd.get(i))
          if (t.nonEmpty) { if (sb.nonEmpty) sb.append("\n\n"); sb.append(t) }
          i += 1
        }
        val all = sb.toString
        return Extraction(if (all.nonEmpty) 1 else 0, all)
      }

      val out = new StringBuilder
      val nTake = math.min(pageBeg.size(), maxPages)
      i = 0
      while (i < nTake) {
        val pageText = new StringBuilder
        contentRefs(raw, pageBeg.get(i), pageEnd.get(i)).foreach { ref =>
          val boxed = byNum.get(ref)
          if (boxed != null) {
            val packed: Long = boxed
            val t = streamText(bytes, raw, (packed >>> 32).toInt, packed.toInt)
            if (t.nonEmpty) {
              if (pageText.nonEmpty) pageText.append(' ')
              pageText.append(t)
            }
          }
        }
        if (pageText.nonEmpty) {
          if (out.nonEmpty) out.append("\n\n")
          out.append(pageText)
        }
        i += 1
      }
      Extraction(pageBeg.size(), out.toString.trim)
    } catch { case _: Exception => Extraction(0, "") }
  }

  /** "/Type", optional whitespace, "/Page" not followed by a letter,
    * anywhere in [s, e).
    */
  private def isPageBody(raw: String, s: Int, e: Int): Boolean = {
    var i = raw.indexOf("/Type", s)
    while (i >= 0 && i + 5 <= e) {
      var j = i + 5
      while (j < e && isWs(raw.charAt(j))) j += 1
      if (j + 5 <= e && raw.startsWith("/Page", j)) {
        val k = j + 5
        val c = if (k < e) raw.charAt(k) else ' '
        if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) return true
      }
      i = raw.indexOf("/Type", i + 1)
    }
    false
  }

  /** /Contents refs of a page object: single "N G R" or an array. */
  private def contentRefs(raw: String, s: Int, e: Int): List[Int] = {
    var i = raw.indexOf("/Contents", s)
    while (i >= 0 && i + 9 <= e) {
      var j = i + 9
      while (j < e && isWs(raw.charAt(j))) j += 1
      if (j < e && raw.charAt(j) == '[') {
        val close = raw.indexOf(']', j + 1)
        if (close >= 0 && close < e) return refsIn(raw, j + 1, close)
      } else {
        val one = refAt(raw, j, e)
        if (one >= 0) return List(one)
      }
      i = raw.indexOf("/Contents", i + 1)
    }
    Nil
  }

  /** Parse \d+\s+\d+\s+R exactly at position j (within [j, e)); the
    * first number, or -1 when the shape does not match there.
    */
  private def refAt(raw: String, j0: Int, e: Int): Int = {
    var j = j0
    val a = j; while (j < e && isDigit(raw.charAt(j))) j += 1
    if (j == a) return -1
    val b = j
    val w = j; while (j < e && isWs(raw.charAt(j))) j += 1
    if (j == w) return -1
    val c = j; while (j < e && isDigit(raw.charAt(j))) j += 1
    if (j == c) return -1
    val w2 = j; while (j < e && isWs(raw.charAt(j))) j += 1
    if (j == w2 || j >= e || raw.charAt(j) != 'R') return -1
    java.lang.Integer.parseInt(raw.substring(a, b))
  }

  /** All \d+\s+\d+\s+R occurrences in [s, e), left to right. */
  private def refsIn(raw: String, s: Int, e: Int): List[Int] = {
    val out = scala.collection.mutable.ListBuffer.empty[Int]
    var i = s
    while (i < e) {
      if (isDigit(raw.charAt(i))) {
        var j = i; while (j < e && isDigit(raw.charAt(j))) j += 1
        val b = j
        while (j < e && isWs(raw.charAt(j))) j += 1
        if (j > b && j < e && isDigit(raw.charAt(j))) {
          var k = j; while (k < e && isDigit(raw.charAt(k))) k += 1
          val w2 = k
          while (k < e && isWs(raw.charAt(k))) k += 1
          if (k > w2 && k < e && raw.charAt(k) == 'R') {
            out += java.lang.Integer.parseInt(raw.substring(i, b))
            i = k + 1
          } else i += 1
        } else i += 1
      } else i += 1
    }
    out.toList
  }

  /** The show-text content of an object's stream, or "" — the
    * streamOf+showText fusion: payload bytes slice directly out of the
    * input array (no substring/getBytes copies), plain streams tokenize
    * in place over `raw`.
    */
  private def streamText(bytes: Array[Byte], raw: String, s: Int, e: Int): String = {
    val si = raw.indexOf("stream", s)
    if (si < 0 || si + 6 > e) return ""
    var p = si + 6
    if (p < e && raw.charAt(p) == '\r') p += 1
    if (p < e && raw.charAt(p) == '\n') p += 1
    val ei = raw.indexOf("endstream", p)
    if (ei < 0 || ei + 9 > e) return ""
    val fl = raw.indexOf("/FlateDecode", s)
    if (fl >= 0 && fl + 12 <= si) {
      try {
        val inflated = inflate(bytes, p, ei - p)
        val content = new String(inflated, "ISO-8859-1")
        showText(content, 0, content.length)
      } catch { case _: Exception => "" }
    } else showText(raw, p, ei)
  }

  private val localInflater = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater()
  }

  private def inflate(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val inf = localInflater.get()
    inf.reset()
    inf.setInput(data, off, len)
    val out = new java.io.ByteArrayOutputStream(math.max(64, len * 4))
    val buf = new Array[Byte](8192)
    var stalled = false
    while (!inf.finished() && !stalled) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (inf.needsInput() || inf.needsDictionary()) stalled = true
    }
    out.toByteArray
  }

  /** Tokenize a content stream slice [from, to) and collect the strings
    * consumed by the show-text operators. Strings not claimed by a show
    * op are dropped at the next BT/ET boundary.
    */
  private def showText(content: String, from: Int, to: Int): String = {
    val sb = new StringBuilder
    val pending = new StringBuilder
    val n = to
    var i = from

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
        case 'B' if content.startsWith("BT", i) && i + 2 <= n =>
          pending.setLength(0); i += 2
        case 'E' if content.startsWith("ET", i) && i + 2 <= n =>
          pending.setLength(0); i += 2
        case _ => i += 1
      }
    }
    sb.toString.trim
  }
}
