package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Charset DETECTION + decode — the step between raw crawl bytes and every
 * text operator: web content arrives as UTF-8 (with and without BOM),
 * UTF-16 (BOM'd or NUL-patterned), and legacy single-byte pages, and
 * feeding mis-decoded bytes into quality/dedup silently corrupts the
 * corpus. Deterministic, spec-grounded detection:
 *
 *  1. BOM: EF BB BF → utf-8; FF FE → utf-16le; FE FF → utf-16be.
 *  2. Strict UTF-8 validation (RFC 3629: continuation structure, no
 *     overlongs, no surrogates, max U+10FFFF) → utf-8.
 *  3. NUL-pattern heuristic for BOM-less UTF-16 (>= 40% zero bytes on one
 *     parity of an even-length buffer).
 *  4. Fallback: latin-1 (every byte maps — the de-facto web fallback).
 *
 * Never throws; decode strips the BOM. All paths are deterministic, so
 * the d91 oracle replays both the label and the decoded text.
 */
object CharsetDetect {

  def detect(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return "empty"
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
        (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF) return "utf-8"
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xFF) == 0xFE) return "utf-16le"
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE &&
        (bytes(1) & 0xFF) == 0xFF) return "utf-16be"
    // NUL-parity BEFORE the UTF-8 scan: BOM-less UTF-16 of ASCII text is
    // byte-wise valid UTF-8 (NUL is a legal code point), but real text
    // never carries NULs — their one-sided parity is the stronger signal
    if (bytes.length >= 8 && bytes.length % 2 == 0) {
      var zeroOdd = 0
      var zeroEven = 0
      var i = 0
      while (i < bytes.length) {
        if (bytes(i) == 0) { if (i % 2 == 0) zeroEven += 1 else zeroOdd += 1 }
        i += 1
      }
      val half = bytes.length / 2
      if (zeroOdd * 5 >= half * 2 && zeroEven == 0) return "utf-16le"
      if (zeroEven * 5 >= half * 2 && zeroOdd == 0) return "utf-16be"
    }
    if (isValidUtf8(bytes)) return "utf-8"
    "latin-1"
  }

  /** RFC 3629 validation: structure, overlongs, surrogates, range. */
  private[llm] def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // continuation or overlong lead
      else if (c < 0xE0) { // 2-byte
        if (i + 1 >= b.length || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (c < 0xF0) { // 3-byte
        if (i + 2 >= b.length) return false
        val c1 = b(i + 1) & 0xFF
        if ((c1 & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80) return false
        if (c == 0xE0 && c1 < 0xA0) return false // overlong
        if (c == 0xED && c1 > 0x9F) return false // surrogate
        i += 3
      } else if (c < 0xF5) { // 4-byte
        if (i + 3 >= b.length) return false
        val c1 = b(i + 1) & 0xFF
        if ((c1 & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80 ||
            (b(i + 3) & 0xC0) != 0x80) return false
        if (c == 0xF0 && c1 < 0x90) return false // overlong
        if (c == 0xF4 && c1 > 0x8F) return false // past U+10FFFF
        i += 4
      } else return false
    }
    true
  }

  /** (detected charset, decoded text with BOM stripped). */
  def decode(bytes: Array[Byte]): (String, String) = {
    val cs = detect(bytes)
    val (skip, name) = cs match {
      case "empty" => return ("empty", "")
      case "utf-8" =>
        val bom = bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF
        (if (bom) 3 else 0, "UTF-8")
      case "utf-16le" =>
        val bom = (bytes(0) & 0xFF) == 0xFF
        (if (bom) 2 else 0, "UTF-16LE")
      case "utf-16be" =>
        val bom = (bytes(0) & 0xFF) == 0xFE
        (if (bom) 2 else 0, "UTF-16BE")
      case _ => (0, "ISO-8859-1")
    }
    (cs, new String(bytes, skip, bytes.length - skip, name))
  }

  /** Detection + decode over document rows: (idCol, charset, text).
    * Narrow per-row map — the ingest-boundary pass, like langid. */
  def withDecodedText(docs: DataFrame, idCol: String = "doc_id",
                      bytesCol: String = "raw"): DataFrame = {
    val dec = udf { (b: Array[Byte]) =>
      val (cs, text) = decode(b)
      (cs, text)
    }
    docs.withColumn("__d", dec(col(bytesCol)))
      .select(col(idCol), col("__d._1").as("charset"), col("__d._2").as("text"))
  }
}
