package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * WARC-style crawl-archive ingestion (ISO 28500 / the Common Crawl layout):
 * an archive is a CONCATENATION of independently-gzipped members, one WARC
 * record per member — the member-per-record convention exists precisely so
 * a distributed reader can split archives at member boundaries and seek to
 * a record without inflating everything before it.
 *
 * [[gzipMembers]] walks the members manually (RFC 1952 header fields, raw
 * DEFLATE via `java.util.zip.Inflater(nowrap)`, CRC32 + ISIZE trailer
 * verified per member) rather than trusting `GZIPInputStream`'s silent
 * multi-member concatenation — a corrupt member loud-fails instead of
 * truncating the archive. [[parseWarcRecord]] then reads the record
 * headers (`WARC-Target-URI`, `Content-Length`) and slices the payload.
 *
 * Scale shape: archives are opaque binary rows; decode is a narrow per-row
 * map (one row in, records out via explode) — at crawl scale the unit of
 * parallelism is the archive file, exactly how WARC corpora ship.
 */
object Warc {

  /** Inflate ONE gzip member starting at `off`; returns (member, nextOff).
    * Throws (descriptive IllegalArgumentException, or an index/inflate
    * error on adversarial header bytes) on any corruption — both callers
    * below wrap this with their own failure policy. */
  private def memberAt(data: Array[Byte], off: Int): (Array[Byte], Int) = {
    require(off + 18 <= data.length, s"truncated gzip header at $off")
    require((data(off) & 0xFF) == 0x1F && (data(off + 1) & 0xFF) == 0x8B,
      s"bad gzip magic at $off")
    require(data(off + 2) == 8, s"unsupported gzip method at $off")
    val flg = data(off + 3)
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = (data(p) & 0xFF) | ((data(p + 1) & 0xFF) << 8)
      p += 2 + xlen
    }
    if ((flg & 8) != 0) { while (data(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (data(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    require(p < data.length, s"header ran past end of data at $off")
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(data, p, data.length - p)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || !inf.needsInput(), s"truncated deflate data at $off")
        bos.write(buf, 0, n)
      }
      val member = bos.toByteArray
      val consumed = (data.length - p) - inf.getRemaining
      val t = p + consumed
      require(t + 8 <= data.length, s"truncated gzip trailer at $t")
      def le32(o: Int): Long = (data(o) & 0xFFL) | ((data(o + 1) & 0xFFL) << 8) |
        ((data(o + 2) & 0xFFL) << 16) | ((data(o + 3) & 0xFFL) << 24)
      val crc = new java.util.zip.CRC32()
      crc.update(member)
      require(crc.getValue == le32(t), s"gzip CRC mismatch in member at $off")
      require((member.length & 0xFFFFFFFFL) == le32(t + 4),
        s"gzip ISIZE mismatch in member at $off")
      (member, t + 8)
    } finally inf.end()
  }

  /** Inflate every gzip member of a concatenated-gzip stream, verifying
    * each member's CRC32 and ISIZE trailer. Throws on any malformed or
    * corrupt member — the STRICT mode for curated archives, where a
    * corrupt member must not silently truncate the archive. Crawl-scale
    * ingest of UNTRUSTED bytes goes through [[gzipMembersSafe]] /
    * [[warcIngestQuarantine]] instead, where corruption quarantines the
    * archive rather than killing the task. */
  def gzipMembers(data: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 0
    while (off < data.length) {
      val (m, next) = memberAt(data, off)
      out += m
      off = next
    }
    out.toSeq
  }

  /** NEVER-THROW member walk: the members before the first corruption,
    * plus Some(description) if the walk stopped early. The quarantine
    * primitive for untrusted crawl bytes — a task must survive ANY byte
    * pattern (same contract the media codecs carry, fuzz-gated in
    * WarcFuzzSpec). */
  def gzipMembersSafe(data: Array[Byte]): (Seq[Array[Byte]], Option[String]) = {
    if (data == null) return (Nil, Some("null payload"))
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 0
    while (off < data.length) {
      val step =
        try Right(memberAt(data, off))
        catch { case scala.util.control.NonFatal(e) =>
          Left(s"corrupt gzip member at offset $off: ${e.getMessage}")
        }
      step match {
        case Right((m, next)) => out += m; off = next
        case Left(err) => return (out.toSeq, Some(err))
      }
    }
    (out.toSeq, None)
  }

  /** Parse one WARC record: header block (CRLF lines up to a blank line),
    * then exactly `Content-Length` payload bytes. Returns
    * (targetUri, payload) or None if it isn't a WARC record. */
  def parseWarcRecord(member: Array[Byte]): Option[(String, Array[Byte])] = {
    val sep = "\r\n\r\n".getBytes("US-ASCII")
    val end = member.indexOfSlice(sep)
    if (end < 0) return None
    val head = new String(member, 0, end, "US-ASCII")
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines.head.startsWith("WARC/")) return None
    def field(name: String): Option[String] = lines.collectFirst {
      case l if l.toLowerCase.startsWith(name.toLowerCase + ":") =>
        l.substring(name.length + 1).trim
    }
    val uri = field("WARC-Target-URI").getOrElse(return None)
    val len = field("Content-Length").flatMap(_.toIntOption).getOrElse(return None)
    val start = end + sep.length
    // long arithmetic: a hostile Content-Length near Int.MaxValue would
    // overflow `start + len` to negative and sneak past the bounds check
    if (len < 0 || start.toLong + len.toLong > member.length) return None
    Some((uri, member.slice(start, start + len)))
  }

  /** Explode (archive_id, payload) archive rows into WARC records with
    * exact integrity signals: record index within the archive, target
    * URI, payload length, and the payload byte sum (the d70 oracle
    * replays all of them in closed form). */
  def warcIngest(archives: DataFrame, idCol: String = "archive_id",
                 payloadCol: String = "payload"): DataFrame = {
    val dec = udf { (payload: Array[Byte]) =>
      gzipMembers(payload).zipWithIndex.flatMap { case (m, i) =>
        parseWarcRecord(m).map { case (uri, body) =>
          var s = 0L
          body.foreach(b => s += (b & 0xFF))
          (i, uri, body.length, s)
        }
      }
    }
    archives.withColumn("__r", explode(dec(col(payloadCol))))
      .select(col(idCol),
        col("__r._1").as("record_idx"), col("__r._2").as("uri"),
        col("__r._3").cast("long").as("n_bytes"), col("__r._4").as("byte_sum"))
  }

  /** [[warcIngest]]'s UNTRUSTED-BYTES sibling: the same record explode,
    * but corruption QUARANTINES instead of killing the task. Every
    * archive yields the records of its valid member prefix (quarantined
    * = false); an archive whose walk hit corruption additionally yields
    * ONE marker row (record_idx = -1, null uri/bytes, quarantined =
    * true) so downstream can count/route bad archives without a second
    * pass. At 100 TB some byte pattern WILL hit every branch — this is
    * the ingest the crawl path should run (d87 gate; fuzz-hardened in
    * WarcFuzzSpec). */
  def warcIngestQuarantine(archives: DataFrame, idCol: String = "archive_id",
                           payloadCol: String = "payload"): DataFrame = {
    val dec = udf { (payload: Array[Byte]) =>
      val (members, err) = gzipMembersSafe(payload)
      val good = members.zipWithIndex.flatMap { case (m, i) =>
        parseWarcRecord(m).map { case (uri, body) =>
          var s = 0L
          body.foreach(b => s += (b & 0xFF))
          (i, Option(uri), Option(body.length.toLong), Option(s), false)
        }
      }
      good ++ err.map(_ =>
        (-1, Option.empty[String], Option.empty[Long], Option.empty[Long], true))
    }
    archives.withColumn("__r", explode(dec(col(payloadCol))))
      .select(col(idCol),
        col("__r._1").as("record_idx"), col("__r._2").as("uri"),
        col("__r._3").as("n_bytes"), col("__r._4").as("byte_sum"),
        col("__r._5").as("quarantined"))
  }

  /** [[warcIngest]]'s BYTES-preserving sibling: explode archives into
    * (record_idx, uri, body BINARY) — the form multi-format crawl
    * routing needs (PDF/image records are not UTF-8; decoding them as
    * text corrupts the bytes before a sniffer can route them). Corrupt
    * archives quarantine like [[warcIngestQuarantine]]: the valid member
    * prefix yields records, nothing throws. */
  def warcIngestRaw(archives: DataFrame, idCol: String = "archive_id",
                    payloadCol: String = "payload"): DataFrame = {
    val dec = udf { (payload: Array[Byte]) =>
      val (members, _) = gzipMembersSafe(payload)
      members.zipWithIndex.flatMap { case (m, i) =>
        parseWarcRecord(m).map { case (uri, body) => (i, uri, body) }
      }
    }
    archives.withColumn("__r", explode(dec(col(payloadCol))))
      .select(col(idCol),
        col("__r._1").as("record_idx"), col("__r._2").as("uri"),
        col("__r._3").as("body"))
  }

  /** [[warcIngest]]'s content-carrying sibling: explode archives into
    * (record_idx, uri, body) with the payload decoded as UTF-8 text —
    * the form the downstream extract/quality stages consume (d72). */
  def warcIngestText(archives: DataFrame, idCol: String = "archive_id",
                     payloadCol: String = "payload"): DataFrame = {
    val dec = udf { (payload: Array[Byte]) =>
      gzipMembers(payload).zipWithIndex.flatMap { case (m, i) =>
        parseWarcRecord(m).map { case (uri, body) =>
          (i, uri, new String(body, "UTF-8"))
        }
      }
    }
    archives.withColumn("__r", explode(dec(col(payloadCol))))
      .select(col(idCol),
        col("__r._1").as("record_idx"), col("__r._2").as("uri"),
        col("__r._3").as("body"))
  }

  /**
   * Deterministic MULTI-FORMAT crawl archive for a key — the realistic
   * Common Crawl shape: TWO records per archive, record 0 a real HTML
   * page (title `T<id>`, five body words `h<(id·3+k·7)%50>`, plus a
   * script block the extractor must drop), record 1 a real PDF
   * ([[graft.llm.Pdf.syntheticPdf]] — FlateDecoded content stream). Both
   * closed-form, so the d90 oracle replays the EXTRACTED text of each
   * record after the content-sniff routing.
   */
  def syntheticCrawlWarc(id: Long): Array[Byte] = {
    val words = (0 until 5).map(k => s"h${(id * 3 + k * 7) % 50}").mkString(" ")
    val html = (s"<html><head><title>T$id</title></head>" +
      s"<body><p>$words</p><script>var x=1;</script></body></html>")
      .getBytes("US-ASCII")
    val pdf = graft.llm.Pdf.syntheticPdf(id)
    val out = new java.io.ByteArrayOutputStream()
    Seq(("text/html", html), ("application/pdf", pdf)).zipWithIndex.foreach {
      case ((ctype, body), r) =>
        val head = (s"WARC/1.0\r\n" +
          s"WARC-Type: response\r\n" +
          s"WARC-Target-URI: http://site${id % 50}.com/doc$r\r\n" +
          s"Content-Type: $ctype\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
        val gz = new java.util.zip.GZIPOutputStream(out)
        // close(), not finish(): ends the native Deflater deterministically
        // (finish leaves the zlib state to the finalizer; at crawl scale
        // that is GBs of native memory waiting on GC). BAOS.close() is a
        // no-op, so concatenated members keep appending to `out`.
        gz.write(head); gz.write(body); gz.close()
    }
    out.toByteArray
  }

  /** Deterministic synthetic WARC archive for a key: `3 + id%4` records,
    * each an independently-gzipped member (real DEFLATE, real CRC32
    * trailers) holding a WARC/1.0 response record for
    * `http://site{id%50}.com/p{r}` whose body is `40 + (id + r) % 30`
    * bytes of `((id·13 + r·7 + j·3) % 26) + 'a'` — closed-form, so an
    * external engine recomputes every length and byte sum. */
  def syntheticWarcGz(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val nRec = (3 + id % 4).toInt
    var r = 0
    while (r < nRec) {
      val len = (40 + (id + r) % 30).toInt
      val body = new Array[Byte](len)
      var j = 0
      while (j < len) {
        body(j) = (((id * 13 + r * 7 + j * 3) % 26) + 'a').toByte
        j += 1
      }
      val head = (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Target-URI: http://site${id % 50}.com/p$r\r\n" +
        s"Content-Length: $len\r\n\r\n").getBytes("US-ASCII")
      val gz = new java.util.zip.GZIPOutputStream(out)
      // close(), not finish(): see syntheticCrawlWarc — ends the Deflater
      // without waiting for a finalizer; BAOS keeps accepting members.
      gz.write(head); gz.write(body); gz.close()
      r += 1
    }
    out.toByteArray
  }
}
