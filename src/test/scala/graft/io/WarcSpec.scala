package graft.io

import graft.SparkSpec

class WarcSpec extends SparkSpec {

  test("gzipMembers: member boundaries, CRC verification, payload round-trip") {
    val bytes = Warc.syntheticWarcGz(7L)
    val members = Warc.gzipMembers(bytes)
    assert(members.length == (3 + 7 % 4))
    val recs = members.flatMap(Warc.parseWarcRecord)
    assert(recs.length == members.length)
    recs.zipWithIndex.foreach { case ((uri, body), r) =>
      assert(uri == s"http://site7.com/p$r")
      val len = (40 + (7 + r) % 30)
      assert(body.length == len)
      body.zipWithIndex.foreach { case (b, j) =>
        assert(b == (((7 * 13 + r * 7 + j * 3) % 26) + 'a').toByte)
      }
    }
  }

  test("gzipMembers: FNAME/FEXTRA/FCOMMENT header fields are skipped") {
    // hand-build one member with all optional fields set
    val body = "WARC/1.0\r\nWARC-Target-URI: http://x/y\r\nContent-Length: 3\r\n\r\nabc"
      .getBytes("US-ASCII")
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(body); deflater.finish()
    val comp = new Array[Byte](1024)
    val n = deflater.deflate(comp)
    deflater.end()
    val crc = new java.util.zip.CRC32(); crc.update(body)
    val out = new java.io.ByteArrayOutputStream()
    // header: magic, CM=8, FLG = FEXTRA|FNAME|FCOMMENT (4|8|16), mtime 0,
    // XFL 0, OS 255
    out.write(Array[Byte](0x1F, 0x8B.toByte, 8, (4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 0xFF.toByte))
    out.write(Array[Byte](3, 0)); out.write(Array[Byte](1, 2, 3)) // FEXTRA len 3
    out.write("name.warc".getBytes("US-ASCII")); out.write(0)     // FNAME
    out.write("a comment".getBytes("US-ASCII")); out.write(0)     // FCOMMENT
    out.write(comp, 0, n)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    out.write(le32(crc.getValue)); out.write(le32(body.length.toLong))
    val members = Warc.gzipMembers(out.toByteArray)
    assert(members.length == 1)
    val Some((uri, payload)) = Warc.parseWarcRecord(members.head)
    assert(uri == "http://x/y" && new String(payload, "US-ASCII") == "abc")
  }

  test("gzipMembers: corrupt CRC and truncation loud-fail") {
    val bytes = Warc.syntheticWarcGz(3L)
    // flip a bit in the LAST member's trailer CRC (final 8 bytes are
    // CRC32+ISIZE of the last member)
    val corrupt = bytes.clone()
    corrupt(corrupt.length - 6) = (corrupt(corrupt.length - 6) ^ 0x01).toByte
    intercept[IllegalArgumentException](Warc.gzipMembers(corrupt))
    intercept[IllegalArgumentException](
      Warc.gzipMembers(bytes.take(bytes.length - 4)))
    intercept[IllegalArgumentException](
      Warc.gzipMembers(Array.fill[Byte](32)(0x42)))
  }

  test("parseWarcRecord rejects non-WARC members") {
    assert(Warc.parseWarcRecord("HTTP/1.1 200 OK\r\n\r\nx".getBytes).isEmpty)
    assert(Warc.parseWarcRecord("WARC/1.0\r\nno-blank-line".getBytes).isEmpty)
  }
}
