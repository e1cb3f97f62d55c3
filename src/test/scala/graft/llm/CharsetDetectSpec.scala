package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class CharsetDetectSpec extends AnyFunSuite {

  test("BOMs route and strip; the same text round-trips from every encoding") {
    val text = "café — naïve résumé"
    assert(CharsetDetect.decode(text.getBytes("UTF-8")) == ("utf-8", text))
    assert(CharsetDetect.decode(
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        text.getBytes("UTF-8")) == ("utf-8", text))
    assert(CharsetDetect.decode(
      Array[Byte](0xFF.toByte, 0xFE.toByte) ++
        text.getBytes("UTF-16LE")) == ("utf-16le", text))
    assert(CharsetDetect.decode(
      Array[Byte](0xFE.toByte, 0xFF.toByte) ++
        text.getBytes("UTF-16BE")) == ("utf-16be", text))
    val latin = "café au lait".getBytes("ISO-8859-1")
    assert(CharsetDetect.decode(latin) == ("latin-1", "café au lait"))
  }

  test("BOM-less UTF-16 detects via the NUL-parity heuristic") {
    val ascii = "plain ascii text here!!" // even length, all < 0x80
    assert(CharsetDetect.detect(ascii.getBytes("UTF-16LE")) == "utf-16le")
    assert(CharsetDetect.detect(ascii.getBytes("UTF-16BE")) == "utf-16be")
  }

  test("strict RFC 3629: overlongs, surrogates, bad continuations rejected") {
    assert(!CharsetDetect.isValidUtf8(Array(0xC0.toByte, 0xAF.toByte))) // overlong /
    assert(!CharsetDetect.isValidUtf8(Array(0xE0.toByte, 0x80.toByte, 0xAF.toByte)))
    assert(!CharsetDetect.isValidUtf8( // UTF-8-encoded surrogate U+D800
      Array(0xED.toByte, 0xA0.toByte, 0x80.toByte)))
    assert(!CharsetDetect.isValidUtf8(Array(0xF5.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte)))
    assert(!CharsetDetect.isValidUtf8(Array('a'.toByte, 0x80.toByte))) // bare continuation
    assert(CharsetDetect.isValidUtf8("ok — 文字 🙂".getBytes("UTF-8")))
    // truncated multi-byte tail
    val t = "é".getBytes("UTF-8")
    assert(!CharsetDetect.isValidUtf8(t.take(1)))
  }

  test("hostile bytes never throw; empty input labeled") {
    assert(CharsetDetect.decode(Array.emptyByteArray) == ("empty", ""))
    assert(CharsetDetect.detect(null) == "empty")
    val rnd = new scala.util.Random(23)
    (1 to 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      val (cs, text) = CharsetDetect.decode(b)
      assert(cs.nonEmpty && text != null)
    }
  }
}
