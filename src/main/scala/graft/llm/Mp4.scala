package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Minimal pure-JVM ISO-BMFF (MP4, ISO/IEC 14496-12) container support —
 * the format real crawl video actually arrives in. The walk is
 * codec-agnostic: `ftyp` (brand), `moov/trak` selection by `hdlr` type
 * `vide`, `mdhd` timescale, and the full sample-table resolution —
 * `stts` (decode deltas), `stsz` (sizes), `stsc` + `stco`/`co64`
 * (sample-to-chunk expansion → absolute file offsets) — returning every
 * sample's bytes and duration. Decoding the samples is then the CODEC's
 * job: MJPEG-in-MP4 (`jpeg` sample entries, one complete JFIF/T.81
 * stream per sample) routes through [[Multimodal.decodeJpeg]], which
 * completes the video story the way PNG→JPEG completed images; H.264
 * decode stays out of scope by design.
 *
 * The synthetic fixture writes REAL files: ftyp + moov (mvhd, tkhd,
 * mdhd, hdlr, vmhd, dinf, stsd['jpeg'], stts, stsc, stsz, stco) + mdat,
 * with the samples split across TWO chunks so the stsc expansion is
 * load-bearing, and every sample a planted [[Multimodal.syntheticJpeg]]
 * whose decoded channel sums have a closed form the SQL oracle replays.
 *
 * Scale shape: parse + decode is a narrow per-row map (no shuffle); at
 * 100 TB the payloads stream through `binaryFile`/blob columns
 * partition-parallel, exactly like the image/audio codec families.
 */
object Mp4 {

  // ---------------------------------------------------------------- write

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  private def box(tag: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = concat(parts: _*)
    concat(be32(8L + payload.length), tag.getBytes("US-ASCII"), payload)
  }

  /** Identity transform matrix (9 × 32-bit fixed-point). */
  private val matrix: Array[Byte] = concat(
    be32(0x00010000L), be32(0), be32(0),
    be32(0), be32(0x00010000L), be32(0),
    be32(0), be32(0), be32(0x40000000L))

  /**
   * Deterministic MJPEG-in-MP4 for a key: `2 + id % 3` samples, each a
   * complete [[Multimodal.syntheticJpeg]] stream for key `id·101 + k`
   * (so every sample's decoded sums replay from the m11 closed form);
   * uniform sample duration `100 + id % 5` at timescale 600. Samples
   * are laid out in TWO mdat chunks (2 + rest) so `stsc` expansion and
   * both `stco` offsets are exercised, not just a trivial single chunk.
   */
  def syntheticMp4(id: Long): Array[Byte] = {
    val n = (2 + id % 3).toInt
    val samples = (0 until n).map(k => Multimodal.syntheticJpeg(id * 101 + k)).toArray
    val delta = 100 + (id % 5)
    val dur = n * delta
    val timescale = 600L
    // first sample's dims drive the declared track/sample-entry size
    val w = 8 * (2 + (id * 101) % 3).toInt
    val h = 8 * (2 + (id * 101) % 2).toInt
    val chunk1 = math.min(2, n)
    val chunk2 = n - chunk1

    def buildMoov(off1: Long, off2: Long): Array[Byte] = {
      val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(timescale), be32(dur),
        be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0), matrix,
        concat((1 to 6).map(_ => be32(0)): _*), be32(2))
      val tkhd = box("tkhd", be32(7) /* v0, flags: enabled|in-movie|preview */,
        be32(0), be32(0), be32(1), be32(0), be32(dur), be32(0), be32(0),
        be16(0), be16(0), be16(0), be16(0), matrix,
        be32(w.toLong << 16), be32(h.toLong << 16))
      val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(timescale), be32(dur),
        be16(0x55C4) /* und */, be16(0))
      val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes("US-ASCII"),
        be32(0), be32(0), be32(0), "VideoHandler".getBytes("US-ASCII"), Array(0.toByte))
      // VisualSampleEntry 'jpeg': 6 reserved + dref idx, 16 predefined,
      // dims, 72 dpi, frame_count 1, 32-byte compressor name, depth, -1
      val stsd = box("stsd", be32(0), be32(1),
        box("jpeg", new Array[Byte](6), be16(1),
          new Array[Byte](16), be16(w), be16(h),
          be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
          new Array[Byte](32), be16(0x0018), be16(0xFFFF)))
      val stts = box("stts", be32(0), be32(1), be32(n), be32(delta))
      val stsc =
        if (chunk2 == 0) box("stsc", be32(0), be32(1), be32(1), be32(chunk1), be32(1))
        else box("stsc", be32(0), be32(2),
          be32(1), be32(chunk1), be32(1),
          be32(2), be32(chunk2), be32(1))
      val stsz = box("stsz", be32(0), be32(0), be32(n),
        concat(samples.map(s => be32(s.length)): _*))
      val stco =
        if (chunk2 == 0) box("stco", be32(0), be32(1), be32(off1))
        else box("stco", be32(0), be32(2), be32(off1), be32(off2))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val vmhd = box("vmhd", be32(1), be16(0), be16(0), be16(0), be16(0))
      val dinf = box("dinf", box("dref", be32(0), be32(1),
        box("url ", be32(1) /* self-contained */)))
      val minf = box("minf", vmhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      box("moov", mvhd, trak)
    }

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))
    // two-pass: moov size is offset-independent (stco entries are fixed
    // width), so build once with zeros to size it, then with real offsets
    val moovLen = buildMoov(0, 0).length
    val mdatPayloadStart = ftyp.length + moovLen + 8L
    val off1 = mdatPayloadStart
    val off2 = off1 + samples.take(chunk1).map(_.length.toLong).sum
    val moov = buildMoov(off1, off2)
    val mdat = box("mdat", concat(samples.toIndexedSeq: _*))
    concat(ftyp, moov, mdat)
  }

  /**
   * Deterministic PCM-in-MP4 AUDIO for a key: a `soun` trak with a
   * `twos` (PCM16 big-endian) sample entry, `2 + id % 3` samples of 80
   * frames each at timescale 8000, chunk offsets written through
   * **co64** (the 64-bit table files past 4 GB carry — stco is absent,
   * so the walk's co64 branch is load-bearing), samples again in two
   * chunks. PCM value j of sample k is `((id·13 + k·7 + j) % 401) −
   * 200` — closed form for the oracle.
   */
  def syntheticMp4Audio(id: Long): Array[Byte] = {
    val n = (2 + id % 3).toInt
    val framesPerSample = 80
    val samples = (0 until n).map { k =>
      val b = new Array[Byte](framesPerSample * 2)
      (0 until framesPerSample).foreach { j =>
        val v = (((id * 13 + k * 7 + j) % 401) - 200).toInt
        b(2 * j) = ((v >> 8) & 0xFF).toByte; b(2 * j + 1) = (v & 0xFF).toByte
      }
      b
    }.toArray
    val timescale = 8000L
    val delta = framesPerSample.toLong
    val dur = n * delta
    val chunk1 = math.min(2, n)
    val chunk2 = n - chunk1

    def buildMoov(off1: Long, off2: Long): Array[Byte] = {
      val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(timescale), be32(dur),
        be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0), matrix,
        concat((1 to 6).map(_ => be32(0)): _*), be32(2))
      val tkhd = box("tkhd", be32(7), be32(0), be32(0), be32(1), be32(0), be32(dur),
        be32(0), be32(0), be16(0), be16(0), be16(0x0100), be16(0), matrix,
        be32(0), be32(0))
      val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(timescale), be32(dur),
        be16(0x55C4), be16(0))
      val hdlr = box("hdlr", be32(0), be32(0), "soun".getBytes("US-ASCII"),
        be32(0), be32(0), be32(0), "SoundHandler".getBytes("US-ASCII"), Array(0.toByte))
      // AudioSampleEntry 'twos': reserved+dref, version/revision/vendor,
      // channels 1, samplesize 16, compression 0, packet 0, rate 16.16
      val stsd = box("stsd", be32(0), be32(1),
        box("twos", new Array[Byte](6), be16(1),
          be16(0), be16(0), be32(0), be16(1), be16(16), be16(0), be16(0),
          be32(timescale << 16)))
      val stts = box("stts", be32(0), be32(1), be32(n), be32(delta))
      val stsc =
        if (chunk2 == 0) box("stsc", be32(0), be32(1), be32(1), be32(chunk1), be32(1))
        else box("stsc", be32(0), be32(2),
          be32(1), be32(chunk1), be32(1),
          be32(2), be32(chunk2), be32(1))
      val stsz = box("stsz", be32(0), be32(0), be32(n),
        concat(samples.map(s => be32(s.length)): _*))
      def be64(v: Long): Array[Byte] = concat(be32(v >>> 32), be32(v & 0xFFFFFFFFL))
      val co64 =
        if (chunk2 == 0) box("co64", be32(0), be32(1), be64(off1))
        else box("co64", be32(0), be32(2), be64(off1), be64(off2))
      val stbl = box("stbl", stsd, stts, stsc, stsz, co64)
      val smhd = box("smhd", be32(0), be16(0), be16(0))
      val dinf = box("dinf", box("dref", be32(0), be32(1), box("url ", be32(1))))
      val minf = box("minf", smhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      box("moov", mvhd, trak)
    }

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))
    val moovLen = buildMoov(0, 0).length
    val off1 = ftyp.length + moovLen + 8L
    val off2 = off1 + samples.take(chunk1).map(_.length.toLong).sum
    val moov = buildMoov(off1, off2)
    val mdat = box("mdat", concat(samples.toIndexedSeq: _*))
    concat(ftyp, moov, mdat)
  }

  // ---------------------------------------------------------------- parse

  /** Parsed video track: ftyp major brand, sample-entry fourcc, mdhd
    * timescale, per-sample decode durations, per-sample payload bytes. */
  final case class Mp4Video(brand: String, codec: String, timescale: Long,
                            durations: Array[Long], samples: Array[Array[Byte]])

  /** Iterate child boxes of payload[start, end): (tag, payloadStart, payloadEnd). */
  private def children(p: Array[Byte], start: Long, end: Long): Seq[(String, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    var i = start
    while (i + 8 <= end) {
      val size32 = ((p(i.toInt) & 0xFFL) << 24) | ((p(i.toInt + 1) & 0xFFL) << 16) |
        ((p(i.toInt + 2) & 0xFFL) << 8) | (p(i.toInt + 3) & 0xFFL)
      val tag = new String(p, i.toInt + 4, 4, "US-ASCII")
      var hdr = 8L
      val size =
        if (size32 == 1L) { // 64-bit largesize
          if (i + 16 > end) return out.toSeq
          hdr = 16L
          var v = 0L
          var j = 0
          while (j < 8) { v = (v << 8) | (p((i + 8 + j).toInt) & 0xFFL); j += 1 }
          v
        } else if (size32 == 0L) end - i // box extends to end of enclosing
        else size32
      if (size < hdr || i + size > end) return out.toSeq
      out += ((tag, i + hdr, i + size))
      i += size
    }
    out.toSeq
  }

  private def find(cs: Seq[(String, Long, Long)], tag: String): Option[(Long, Long)] =
    cs.collectFirst { case (t, s, e) if t == tag => (s, e) }

  private def rd32(p: Array[Byte], o: Long): Long =
    ((p(o.toInt) & 0xFFL) << 24) | ((p(o.toInt + 1) & 0xFFL) << 16) |
      ((p(o.toInt + 2) & 0xFFL) << 8) | (p(o.toInt + 3) & 0xFFL)

  private def rd64(p: Array[Byte], o: Long): Long = {
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (p((o + j).toInt) & 0xFFL); j += 1 }
    v
  }

  /** Codec-agnostic VIDEO-track walk (handler `vide`). */
  def parseMp4(payload: Array[Byte]): Option[Mp4Video] = parseTrack(payload, "vide")

  /** Codec-agnostic AUDIO-track walk (handler `soun`) — same sample-table
    * machinery, same return shape (durations are in mdhd-timescale
    * ticks). */
  def parseMp4Audio(payload: Array[Byte]): Option[Mp4Video] = parseTrack(payload, "soun")

  /** Shared trak walk; None for anything not a well-formed single-track-
    * of-that-handler ISO-BMFF. Chunk offsets read from `stco` (32-bit)
    * or `co64` (64-bit — files past 4 GB, the shape real crawl video
    * actually has; sample extraction still requires in-array offsets).
    * Structural validation is explicit; the NonFatal catch is the last
    * line of defense for corrupt size/count fields that steer a table
    * read past the payload (crawl bytes WILL find such a path — the
    * codec-family never-throw contract, fuzz-gated). */
  private def parseTrack(payload: Array[Byte], handler: String): Option[Mp4Video] =
    try parseTrackImpl(payload, handler)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseTrackImpl(payload: Array[Byte], handler: String): Option[Mp4Video] = {
    if (payload == null || payload.length < 16) return None
    val top = children(payload, 0, payload.length.toLong)
    val (fs, _) = find(top, "ftyp").getOrElse(return None)
    val brand = new String(payload, fs.toInt, 4, "US-ASCII")
    val (ms, me) = find(top, "moov").getOrElse(return None)
    val moov = children(payload, ms, me)
    val videoTrak = moov.collect { case ("trak", s, e) => children(payload, s, e) }
      .flatMap { trak =>
        for {
          (mds, mde) <- find(trak, "mdia")
          mdia = children(payload, mds, mde)
          (hs, _) <- find(mdia, "hdlr")
          if new String(payload, hs.toInt + 8, 4, "US-ASCII") == handler
        } yield mdia
      }.headOption.getOrElse(return None)
    val (mhs, _) = find(videoTrak, "mdhd").getOrElse(return None)
    if (payload(mhs.toInt) != 0) return None // mdhd v1 (64-bit times): unsupported
    val timescale = rd32(payload, mhs + 12)
    val stbl = for {
      (mis, mie) <- find(videoTrak, "minf")
      (sts, ste) <- find(children(payload, mis, mie), "stbl")
    } yield children(payload, sts, ste)
    val tables = stbl.getOrElse(return None)
    // stsd: first entry's fourcc is the codec
    val (sds, _) = find(tables, "stsd").getOrElse(return None)
    if (rd32(payload, sds + 4) < 1) return None
    val codec = new String(payload, sds.toInt + 12, 4, "US-ASCII")
    // EVERY table count is validated against its own box size BEFORE any
    // allocation sized by it — a corrupt count field must fail the walk,
    // not size an ArrayBuffer/Array into an OutOfMemoryError the NonFatal
    // backstop cannot catch (fuzz-found failure mode)
    // stts → per-sample durations
    val (tts, tte) = find(tables, "stts").getOrElse(return None)
    val nTts = rd32(payload, tts + 4)
    if (nTts > (tte - tts - 8) / 8) return None // entries must fit the box
    val durations = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0L
    while (i < nTts) {
      val cnt = rd32(payload, tts + 8 + i * 8)
      val delta = rd32(payload, tts + 12 + i * 8)
      if (cnt > (1 << 22) || durations.length + cnt > (1 << 22)) return None
      var k = 0L
      while (k < cnt) { durations += delta; k += 1 }
      i += 1
    }
    // stsz → sizes
    val (szs, sze) = find(tables, "stsz").getOrElse(return None)
    val uniform = rd32(payload, szs + 4)
    val nSamples = rd32(payload, szs + 8).toInt
    if (nSamples < 0 || nSamples > (1 << 22)) return None
    if (uniform == 0 && nSamples > (sze - szs - 12) / 4) return None
    val sizes = Array.tabulate(nSamples)(k =>
      if (uniform != 0) uniform else rd32(payload, szs + 12 + k * 4L))
    // stsc + stco → absolute offsets (expand the sample-to-chunk map)
    val (scs, sce) = find(tables, "stsc").getOrElse(return None)
    val nStsc = rd32(payload, scs + 4).toInt
    if (nStsc < 0 || nStsc > (sce - scs - 8) / 12) return None
    val stscRows = Array.tabulate(nStsc)(r => (
      rd32(payload, scs + 8 + r * 12L),       // first_chunk (1-based)
      rd32(payload, scs + 12 + r * 12L)))     // samples_per_chunk
    val chunkOffsets = (find(tables, "stco"), find(tables, "co64")) match {
      case (Some((cos, coe)), _) =>
        val n = rd32(payload, cos + 4).toInt
        if (n < 0 || n > (coe - cos - 8) / 4) return None
        Array.tabulate(n)(c => rd32(payload, cos + 8 + c * 4L))
      case (None, Some((cos, coe))) => // 64-bit offsets: files past 4 GB
        val n = rd32(payload, cos + 4).toInt
        if (n < 0 || n > (coe - cos - 8) / 8) return None
        Array.tabulate(n)(c => rd64(payload, cos + 8 + c * 8L))
      case _ => return None
    }
    val nChunks = chunkOffsets.length
    val offsets = new Array[Long](nSamples)
    var sample = 0
    var chunk = 0
    while (sample < nSamples && chunk < nChunks) {
      // samples_per_chunk of the last stsc row whose first_chunk <= chunk+1
      val spc = stscRows.takeWhile(_._1 <= chunk + 1).lastOption.map(_._2)
        .getOrElse(return None)
      var off = chunkOffsets(chunk)
      var k = 0L
      while (k < spc && sample < nSamples) {
        offsets(sample) = off
        off += sizes(sample)
        sample += 1; k += 1
      }
      chunk += 1
    }
    if (sample != nSamples || durations.length != nSamples) return None
    val samples = Array.tabulate(nSamples) { k =>
      val o = offsets(k); val sz = sizes(k)
      if (o < 0 || sz < 0 || o + sz > payload.length) return None
      java.util.Arrays.copyOfRange(payload, o.toInt, (o + sz).toInt)
    }
    Some(Mp4Video(brand, codec, timescale, durations.toArray, samples))
  }

  // ---------------------------------------------------------------- stats

  /** Exact integer stats from REAL parsed + decoded MJPEG-in-MP4: brand,
    * codec fourcc, timescale, sample count, total duration (sum of stts
    * deltas), first-sample dims, and per-channel pixel sums over ALL
    * decoded samples — the oracle-checkable face of the container walk
    * (the m24 oracle replays every sum from the planted JPEG closed
    * form). Rows that don't parse as video MP4 are dropped. Narrow
    * per-row map, no shuffle. */
  def mp4VideoStats(media: DataFrame): DataFrame = {
    val dec = udf { (payload: Array[Byte]) =>
      parseMp4(payload).flatMap { v =>
        val decoded = v.samples.map(Multimodal.decodeImage)
        if (decoded.exists(_.isEmpty)) None
        else {
          var sr = 0L; var sg = 0L; var sb = 0L
          decoded.flatten.foreach { case (w, h, rgb) =>
            var p = 0
            while (p < w * h * 3) {
              sr += rgb(p) & 0xFF; sg += rgb(p + 1) & 0xFF; sb += rgb(p + 2) & 0xFF
              p += 3
            }
          }
          val (w0, h0, _) = decoded.head.get
          Some((v.brand, v.codec, v.timescale, v.samples.length,
            v.durations.sum, w0, h0, sr, sg, sb))
        }
      }.orNull
    }
    media.withColumn("__m", dec(col("payload")))
      .filter(col("__m").isNotNull)
      .select(col("media_id"),
        col("__m._1").as("brand"), col("__m._2").as("codec"),
        col("__m._3").as("timescale"), col("__m._4").as("n_samples"),
        col("__m._5").as("duration"), col("__m._6").as("width"),
        col("__m._7").as("height"), col("__m._8").as("sum_r"),
        col("__m._9").as("sum_g"), col("__m._10").as("sum_b"))
  }

  /** Exact integer stats from the AUDIO trak (PCM16BE `twos` samples):
    * codec, timescale, sample count, stts duration, total PCM frame
    * count and exact value sum — the oracle-checkable face of the
    * `soun`-handler + co64 walk (m26). Non-audio MP4 rows drop. */
  def mp4AudioStats(media: DataFrame): DataFrame = {
    val dec = udf { (payload: Array[Byte]) =>
      parseMp4Audio(payload).flatMap { v =>
        if (v.codec != "twos" || v.samples.exists(_.length % 2 != 0)) None
        else {
          var nPcm = 0L; var sum = 0L
          v.samples.foreach { s =>
            var j = 0
            while (j < s.length) {
              sum += ((s(j) << 8) | (s(j + 1) & 0xFF)).toShort
              nPcm += 1; j += 2
            }
          }
          Some((v.brand, v.codec, v.timescale, v.samples.length,
            v.durations.sum, nPcm, sum))
        }
      }.orNull
    }
    media.withColumn("__a", dec(col("payload")))
      .filter(col("__a").isNotNull)
      .select(col("media_id"),
        col("__a._1").as("brand"), col("__a._2").as("codec"),
        col("__a._3").as("timescale"), col("__a._4").as("n_samples"),
        col("__a._5").as("duration"), col("__a._6").as("n_pcm"),
        col("__a._7").as("pcm_sum"))
  }
}
