package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** PDF text extraction: all three show-operator styles round-trip to the
  * identical closed-form text, string escapes decode, raw (non-Flate)
  * streams work, and hostile bytes quarantine — never throw. */
class PdfSpec extends AnyFunSuite {

  private def expected(id: Long): String = {
    val nLines = (3 + id % 4).toInt
    (0 until nLines).map { j =>
      (0 until (4 + (id + j) % 3).toInt)
        .map(k => s"w${(id * 7 + j * 11 + k * 13) % 100}").mkString(" ")
    }.mkString("\n")
  }

  test("all three operator styles (Tj/TJ/') extract the identical closed form") {
    (1L to 60L).foreach { id =>
      val got = Pdf.extractPdfText(Pdf.syntheticPdf(id))
      assert(got.isDefined, s"id=$id (style ${id % 3}) failed to extract")
      assert(got.get == expected(id),
        s"id=$id (style ${id % 3}):\n got [${got.get}]\nwant [${expected(id)}]")
    }
  }

  test("string escapes: parens, backslash, octal, line continuation") {
    val content = ("BT (a\\(b\\)c) Tj T* (back\\\\slash) Tj T* " +
      "(oct\\101l) Tj T* (ne(st)ed) Tj ET").getBytes("ISO-8859-1")
    assert(Pdf.contentText(content) == "a(b)c\nback\\slash\noctAl\nne(st)ed")
  }

  test("raw (unfiltered) content streams extract too") {
    val body = "BT (hello raw) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + body.length +
      " >> stream\n" + body + "\nendstream endobj\n%%EOF").getBytes("ISO-8859-1")
    assert(Pdf.extractPdfText(pdf).contains("hello raw"))
  }

  test("text outside BT/ET is ignored; image streams contribute nothing") {
    val content = "(before) Tj BT (inside) Tj ET (after) Tj".getBytes("ISO-8859-1")
    assert(Pdf.contentText(content) == "inside")
  }

  test("hostile inputs return None or empty, never throw") {
    assert(Pdf.extractPdfText(null).isEmpty)
    assert(Pdf.extractPdfText(Array.emptyByteArray).isEmpty)
    assert(Pdf.extractPdfText("not a pdf".getBytes).isEmpty)
    val rnd = new scala.util.Random(17)
    (1 to 40).foreach { trial =>
      val p = Pdf.syntheticPdf(trial.toLong)
      val corrupt = p.clone()
      (1 to 1 + rnd.nextInt(6)).foreach { _ =>
        corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      }
      try Pdf.extractPdfText(corrupt)
      catch { case e: Throwable =>
        fail(s"threw ${e.getClass.getSimpleName} on flipped pdf trial=$trial")
      }
      val cut = java.util.Arrays.copyOf(p, p.length * (trial % 16) / 16)
      try Pdf.extractPdfText(cut)
      catch { case e: Throwable =>
        fail(s"threw ${e.getClass.getSimpleName} on truncated pdf trial=$trial")
      }
    }
    // a deflate bomb must hit the output cap, not the heap
    val big = new java.util.zip.Deflater()
    big.setInput(new Array[Byte](1 << 24)) // 16 MB of zeros compresses tiny
    big.finish()
    val cbuf = new Array[Byte](1 << 20)
    val clen = big.deflate(cbuf); big.end()
    val bomb = ("%PDF-1.4\n1 0 obj << /Filter /FlateDecode >> stream\n")
      .getBytes("ISO-8859-1") ++ java.util.Arrays.copyOf(cbuf, clen) ++
      "\nendstream\n%%EOF".getBytes("ISO-8859-1")
    assert(Pdf.extractPdfText(bomb).isDefined) // quarantined stream, no text
  }
}
