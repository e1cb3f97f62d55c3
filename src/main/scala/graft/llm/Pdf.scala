package graft.llm

/**
 * PDF TEXT EXTRACTION — after HTML (d71) and WARC (d70/d87), the next
 * highest-volume text-carrying crawl format. Implemented from the public
 * PDF 1.7 specification (ISO 32000-1): stream-object scan, FlateDecode
 * (RFC 1951 via `java.util.zip.Inflater`) or raw streams, then the
 * content-stream text operators — `Tj`, `TJ` (kerned arrays), `'`
 * (next-line show), with `Td`/`TD`/`T*` treated as line breaks — and the
 * full string-literal escape set (\\ \( \) \n \r \t, octal \ddd, nested
 * balanced parentheses).
 *
 * Deliberate scope (stated, not hidden): text is extracted as the
 * literal string bytes the operators carry, i.e. unencoded Latin text —
 * the common machine-generated-PDF case. Custom font encodings /
 * ToUnicode CMaps transform the BYTES before they become text; that
 * mapping layer is out of scope here, exactly as the HTML extractor
 * does not execute JavaScript.
 *
 * Contract matches the codec family: `Some(text)` or `None`, NEVER a
 * throw (the d89 gate quarantines corrupt documents; PdfSpec fuzzes).
 */
object Pdf {

  private final class Malformed(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new Malformed(msg)

  /** Extract visible text from a PDF: every stream object's content is
    * inflated (or taken raw), and any stream containing BT/ET text blocks
    * contributes its shown strings; text-positioning operators break
    * lines. Streams that don't parse as content (fonts, images) are
    * skipped silently. */
  def extractPdfText(payload: Array[Byte]): Option[String] = try {
    if (payload == null || payload.length < 8) return None
    if (!(payload(0) == '%' && payload(1) == 'P' && payload(2) == 'D' &&
        payload(3) == 'F' && payload(4) == '-')) return None
    val out = new java.lang.StringBuilder()
    var searchFrom = 0
    var first = true
    while (searchFrom < payload.length) {
      val s = indexOf(payload, "stream", searchFrom)
      if (s < 0) { searchFrom = payload.length }
      else {
        // stream keyword is followed by \r\n or \n (spec 7.3.8.1)
        var dataStart = s + 6
        if (dataStart < payload.length && payload(dataStart) == '\r') dataStart += 1
        if (dataStart < payload.length && payload(dataStart) == '\n') dataStart += 1
        val e = indexOf(payload, "endstream", dataStart)
        if (e < 0) { searchFrom = payload.length }
        else {
          // trailing EOL before endstream is not stream data
          var dataEnd = e
          if (dataEnd > dataStart && payload(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && payload(dataEnd - 1) == '\r') dataEnd -= 1
          val dict = new String(payload,
            math.max(0, s - 256), math.min(256, s), "ISO-8859-1")
          val raw = java.util.Arrays.copyOfRange(payload, dataStart, dataEnd)
          val content =
            if (dict.contains("/FlateDecode")) inflate(raw)
            else Some(raw)
          content.foreach { bytes =>
            val text = contentText(bytes)
            if (text.nonEmpty) {
              if (!first) out.append('\n')
              out.append(text)
              first = false
            }
          }
          searchFrom = e + 9
        }
      }
    }
    Some(out.toString)
  } catch { case scala.util.control.NonFatal(_) => None }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes("US-ASCII")
    var i = math.max(0, from)
    while (i + n.length <= hay.length) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Whole-buffer inflate with a hard output cap (corrupt-count lesson:
    * never let a length field drive allocation; here the bound is a
    * fixed multiple of the input). None on malformed deflate data. */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] = try {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val cap = math.min(1 << 26, math.max(4096, data.length * 200))
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) bad("truncated deflate")
        bos.write(buf, 0, n)
        if (bos.size() > cap) bad("deflate bomb")
      }
      Some(bos.toByteArray)
    } finally inf.end()
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Text shown by one content stream: BT..ET blocks, Tj / TJ / ' show
    * operators, Td / TD / T* line breaks. Empty string when the stream
    * carries no text (an image or font stream that happened to inflate). */
  private[llm] def contentText(bytes: Array[Byte]): String = {
    val s = new String(bytes, "ISO-8859-1")
    val out = new java.lang.StringBuilder()
    var i = 0
    var inText = false
    var lineHasText = false
    def breakLine(): Unit =
      if (lineHasText) { out.append('\n'); lineHasText = false }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') { // comment to EOL (outside strings)
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else if (c == '(') {
        val (str, next) = parseString(s, i)
        i = next
        // the string participates only if a show operator follows
        val op = nextToken(s, i)
        if (inText && (op == "Tj" || op == "'")) {
          if (op == "'") breakLine()
          out.append(str)
          lineHasText = true
        } else if (inText && op == "TJ_ELEM") {
          out.append(str)
          lineHasText = true
        }
      } else if (c == 'B' && s.startsWith("BT", i) && tokenBoundary(s, i, 2)) {
        inText = true; i += 2
      } else if (c == 'E' && s.startsWith("ET", i) && tokenBoundary(s, i, 2)) {
        inText = false; i += 2
      } else if (inText && c == 'T' && i + 1 < s.length &&
          (s.charAt(i + 1) == '*' || s.charAt(i + 1) == 'd' ||
            s.charAt(i + 1) == 'D') && tokenBoundary(s, i, 2)) {
        breakLine(); i += 2
      } else i += 1
    }
    out.toString
  }

  private def tokenBoundary(s: String, at: Int, len: Int): Boolean = {
    val before = at == 0 || !isRegular(s.charAt(at - 1))
    val after = at + len >= s.length || !isRegular(s.charAt(at + len))
    before && after
  }

  private def isRegular(c: Char): Boolean =
    !c.isWhitespace && "()<>[]{}/%".indexOf(c) < 0

  /** What show-operator (if any) governs the string ending at `from`:
    * "Tj", "'", or "TJ_ELEM" when we're inside a [...] TJ array. */
  private def nextToken(s: String, from: Int): String = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length) return ""
    s.charAt(i) match {
      case 'T' if s.startsWith("Tj", i) => "Tj"
      case '\'' => "'"
      case '(' => "TJ_ELEM" // adjacent string: only meaningful inside TJ
      case c if c == '-' || c == '.' || c.isDigit =>
        // a kern number: inside a TJ array, more elements or ] TJ follow
        while (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '.' ||
            s.charAt(i).isDigit)) i += 1
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        if (i < s.length && (s.charAt(i) == '(' || s.charAt(i) == ']'))
          nextToken(s, i) match {
            case "TJ" | "TJ_ELEM" => "TJ_ELEM"
            case other => other
          }
        else ""
      case ']' =>
        var j = i + 1
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (s.startsWith("TJ", j)) "TJ_ELEM" else ""
      case _ => ""
    }
  }

  /** PDF string literal from `(` at `at`: returns (decoded, indexAfter).
    * Handles nested balanced parens, the escape set, and octal codes. */
  private def parseString(s: String, at: Int): (String, Int) = {
    val out = new java.lang.StringBuilder()
    var i = at + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '(' => out.append('('); i += 2
          case ')' => out.append(')'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case d if d >= '0' && d <= '7' =>
            var v = 0
            var k = 0
            i += 1
            while (k < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
              v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
            }
            out.append((v & 0xFF).toChar)
          case other => out.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; out.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) out.append(c)
        i += 1
      } else { out.append(c); i += 1 }
    }
    (out.toString, i)
  }

  /**
   * Deterministic minimal PDF for a key: a spec-valid single-page
   * document (catalog → pages → page → FlateDecoded content stream +
   * xref + trailer). `3 + id%4` text lines; line j shows words
   * `w<(id·7 + j·11 + k·13) % 100>` for `k < 4 + (id+j)%3`, through a
   * ROTATING show-operator style by `id % 3` — 0: `Tj` + `T*` breaks,
   * 1: kerned `TJ` arrays (one element per word), 2: `'` next-line
   * shows — all three extracting to the IDENTICAL text, so the d89
   * oracle replays one closed form while the operator coverage rotates.
   */
  def syntheticPdf(id: Long): Array[Byte] = {
    val nLines = (3 + id % 4).toInt
    val style = (id % 3).toInt
    def word(j: Int, k: Int): String = s"w${(id * 7 + j * 11 + k * 13) % 100}"
    def words(j: Int): Seq[String] =
      (0 until (4 + (id + j) % 3).toInt).map(k => word(j, k))
    val content = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
    style match {
      case 0 =>
        (0 until nLines).foreach { j =>
          val brk = if (j < nLines - 1) " T*" else ""
          content.append(s"(${words(j).mkString(" ")}) Tj$brk\n")
        }
      case 1 =>
        (0 until nLines).foreach { j =>
          val elems = words(j).zipWithIndex.map { case (w, k) =>
            val sep = if (k == 0) "" else "( ) -40 "
            s"$sep($w) ${-120 - k} "
          }.mkString
          val brk = if (j < nLines - 1) " T*" else ""
          content.append(s"[ $elems] TJ$brk\n")
        }
      case _ =>
        content.append(s"(${words(0).mkString(" ")}) Tj\n")
        (1 until nLines).foreach { j =>
          content.append(s"(${words(j).mkString(" ")}) '\n")
        }
    }
    content.append("ET")
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(content.toString.getBytes("ISO-8859-1"))
    deflater.finish()
    val cbuf = new Array[Byte](content.length * 2 + 64)
    val clen = deflater.deflate(cbuf)
    deflater.end()
    val compressed = java.util.Arrays.copyOf(cbuf, clen)

    val out = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit = out.write(t.getBytes("ISO-8859-1"))
    val offsets = new Array[Int](6)
    w("%PDF-1.4\n")
    offsets(1) = out.size()
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(2) = out.size()
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    offsets(3) = out.size()
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    offsets(4) = out.size()
    w(s"4 0 obj << /Length ${compressed.length} /Filter /FlateDecode >> stream\n")
    out.write(compressed)
    w("\nendstream endobj\n")
    offsets(5) = out.size()
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val xref = out.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%%%EOF\n")
    out.toByteArray
  }
}
