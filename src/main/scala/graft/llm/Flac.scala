package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pure-JVM FLAC codec — the compressed audio format a crawl actually
 * carries (lossless; the analogue of what decodePng/decodeJpeg are to the
 * image path). No codec library: the format is fully public
 * (xiph.org / RFC 9639) and the subset below covers everything a real
 * encoder emits for 16-bit PCM:
 *
 *  - STREAMINFO metadata parse + skip of any other metadata blocks
 *  - frame headers: sync walk, UTF-8-coded frame numbers, all block-size
 *    codes (table, 8-bit, 16-bit), sample-rate/bps codes incl.
 *    from-STREAMINFO, CRC-8 verified
 *  - subframes: CONSTANT, VERBATIM, FIXED orders 0–4, LPC any order with
 *    quantized coefficients and arithmetic shift
 *  - residuals: Rice (4-bit AND 5-bit parameter methods), multi-partition
 *    orders, the raw-bits ESCAPE code, zigzag fold, wasted-bits shift
 *  - stereo decorrelation: independent, left/side, right/side, mid/side
 *    (side channels one extra bit, per spec)
 *  - frame CRC-16 verified — a flipped byte anywhere fails the decode
 *
 * [[syntheticFlac]] is the matching deterministic encoder: it emits real
 * FLAC streams whose subframe types, channel modes, partition orders and
 * escape codes vary by (id, frame, channel) so the m17 oracle — which
 * replays the DECODED samples in closed form — exercises every decode
 * branch. Lossless round-trip is the whole point: whatever the encoder
 * chooses, the decoded PCM must equal the planted formula exactly.
 */
object Flac {

  // ---------------------------------------------------------------- bits

  private final class BitReader(data: Array[Byte], var bytePos: Int) {
    var bitPos = 0 // 0..7, MSB first
    def bit(): Int = {
      val b = (data(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def bits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signedBits(n: Int): Int =
      if (n == 0) 0 else ((bits(n) << (64 - n)) >> (64 - n)).toInt
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nAcc = 0
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); nAcc += 1
      if (nAcc == 8) { buf.write(acc); acc = 0; nAcc = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    def align(): Unit = while (nAcc != 0) bit(0)
    /** bytes emitted so far — only valid at byte boundaries (CRC points). */
    def snapshot: Array[Byte] = {
      require(nAcc == 0, "snapshot off byte boundary")
      buf.toByteArray
    }
  }

  // ---------------------------------------------------------------- CRCs

  /** CRC-8, poly 0x07, init 0 — FLAC frame-header checksum. */
  private def crc8(data: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0; var i = off
    while (i < off + len) {
      crc ^= data(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
              else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — FLAC whole-frame checksum. */
  private def crc16(data: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0; var i = off
    while (i < off + len) {
      crc ^= (data(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  // -------------------------------------------------------------- decode

  /** Decode a FLAC stream to `(channels, sampleRate, interleaved PCM)`.
    * Returns None for anything malformed (including any CRC mismatch) or
    * outside the 16-bit subset ([[Multimodal.decodeAudio]] then falls
    * back to the stub path). */
  def decodeFlac(payload: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (payload == null || payload.length < 42) return None
    if (!(payload(0) == 'f' && payload(1) == 'L' &&
          payload(2) == 'a' && payload(3) == 'C')) return None
    try {
      var pos = 4
      var last = false
      var rate = -1; var nch = -1; var bps = -1; var total = -1L
      while (!last) {
        val h = payload(pos) & 0xFF
        last = (h & 0x80) != 0
        val btype = h & 0x7F
        val len = ((payload(pos + 1) & 0xFF) << 16) |
          ((payload(pos + 2) & 0xFF) << 8) | (payload(pos + 3) & 0xFF)
        if (btype == 0) { // STREAMINFO
          val o = pos + 4
          rate = ((payload(o + 10) & 0xFF) << 12) |
            ((payload(o + 11) & 0xFF) << 4) | ((payload(o + 12) & 0xFF) >> 4)
          nch = ((payload(o + 12) >> 1) & 0x7) + 1
          bps = (((payload(o + 12) & 1) << 4) |
            ((payload(o + 13) & 0xFF) >> 4)) + 1
          total = ((payload(o + 13) & 0xFL) << 32) |
            ((payload(o + 14) & 0xFFL) << 24) |
            ((payload(o + 15) & 0xFFL) << 16) |
            ((payload(o + 16) & 0xFFL) << 8) | (payload(o + 17) & 0xFFL)
        }
        pos += 4 + len
      }
      if (rate <= 0 || nch <= 0 || nch > 8 || bps <= 0 || bps > 16 ||
          total <= 0 || total > Int.MaxValue / nch) return None
      // a corrupt STREAMINFO total must not drive the allocation below: a
      // frame is >= 12 bytes (header 10 + CRC16 2) and encodes <= 65535
      // samples, so the remaining payload bounds what ANY valid stream
      // could hold — reject totals past that (OOM-by-corrupt-count class,
      // found by CodecFuzzSpec), with a hard allocation backstop
      val maxEncodable = (payload.length - pos).toLong / 12L * 65535L
      if (total > maxEncodable || total * nch > (1L << 26)) return None
      val n = total.toInt
      val chans = Array.ofDim[Int](nch, n)
      var got = 0
      while (got < n) {
        val frameStart = pos
        val br = new BitReader(payload, pos)
        if (br.bits(14) != 0x3FFE) return None
        br.bit() // reserved
        br.bit() // blocking strategy (number semantics don't matter here)
        val bsCode = br.bits(4).toInt
        val srCode = br.bits(4).toInt
        val chAsn = br.bits(4).toInt
        val ssCode = br.bits(3).toInt
        br.bit() // reserved
        // UTF-8-coded frame/sample number: value unused (frames arrive in
        // stream order), but the continuation bytes must be consumed
        val lead = br.bits(8).toInt
        if ((lead & 0x80) != 0) {
          var mask = 0x40; var extra = 0
          while ((lead & mask) != 0) { extra += 1; mask >>= 1 }
          if (extra == 0) return None
          var i = 0
          while (i < extra) {
            if ((br.bits(8).toInt & 0xC0) != 0x80) return None
            i += 1
          }
        }
        val blockSize = bsCode match {
          case 0 => return None
          case 1 => 192
          case c if c <= 5 => 576 << (c - 2)
          case 6 => br.bits(8).toInt + 1
          case 7 => br.bits(16).toInt + 1
          case c => 256 << (c - 8)
        }
        srCode match { // value itself unused beyond consuming its bits
          case 12 => br.bits(8)
          case 13 | 14 => br.bits(16)
          case 15 => return None
          case _ => ()
        }
        val fbps = ssCode match {
          case 0 => bps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case _ => return None
        }
        if (fbps > 16) return None
        if (br.bitPos != 0) return None // header is byte-aligned here
        val storedCrc8 = br.bits(8).toInt
        if (crc8(payload, frameStart, br.bytePos - 1 - frameStart)
              != storedCrc8) return None
        val nFrameCh = if (chAsn <= 7) chAsn + 1 else 2
        if (chAsn > 10 || nFrameCh != nch) return None
        val sub = new Array[Array[Int]](nFrameCh)
        var c = 0
        while (c < nFrameCh) {
          // the difference (side) channel carries one extra bit, per spec
          val effBps = fbps + (chAsn match {
            case 8 | 10 => if (c == 1) 1 else 0
            case 9 => if (c == 0) 1 else 0
            case _ => 0
          })
          sub(c) = decodeSubframe(br, blockSize, effBps) match {
            case Some(xs) => xs
            case None => return None
          }
          c += 1
        }
        br.align()
        val storedCrc16 = br.bits(16).toInt
        if (crc16(payload, frameStart, br.bytePos - 2 - frameStart)
              != storedCrc16) return None
        val outCh: Array[Array[Int]] = chAsn match {
          case 8 => // left/side: R = L - side
            val l = sub(0); val s = sub(1)
            Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
          case 9 => // right/side: L = side + R
            val s = sub(0); val r = sub(1)
            Array(Array.tabulate(blockSize)(i => s(i) + r(i)), r)
          case 10 => // mid/side: side parity restores the halved bit
            val m = sub(0); val s = sub(1)
            val l = new Array[Int](blockSize); val r = new Array[Int](blockSize)
            var i = 0
            while (i < blockSize) {
              val mm = (m(i) << 1) | (s(i) & 1)
              l(i) = (mm + s(i)) >> 1
              r(i) = (mm - s(i)) >> 1
              i += 1
            }
            Array(l, r)
          case _ => sub
        }
        val take = math.min(blockSize, n - got)
        c = 0
        while (c < nch) {
          System.arraycopy(outCh(c), 0, chans(c), got, take)
          c += 1
        }
        got += take
        pos = br.bytePos
      }
      val out = new Array[Short](nch * n)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < nch) { out(i * nch + c) = chans(c)(i).toShort; c += 1 }
        i += 1
      }
      Some((nch, rate, out))
    } catch { case _: Exception => None }
  }

  private def decodeSubframe(br: BitReader, n: Int, bps: Int): Option[Array[Int]] = {
    if (br.bit() != 0) return None
    val t = br.bits(6).toInt
    var wasted = 0
    if (br.bit() == 1) { wasted = 1; while (br.bit() == 0) wasted += 1 }
    val eb = bps - wasted
    if (eb <= 0) return None
    val out: Array[Int] =
      if (t == 0) { // constant
        val v = br.signedBits(eb); Array.fill(n)(v)
      } else if (t == 1) { // verbatim
        Array.fill(n)(br.signedBits(eb))
      } else if ((t & 0x38) == 8 && (t & 7) <= 4) { // fixed order 0..4
        val order = t & 7
        if (order > n) return None
        val xs = new Array[Int](n)
        var i = 0
        while (i < order) { xs(i) = br.signedBits(eb); i += 1 }
        val res = decodeResidual(br, n, order) match {
          case Some(r) => r; case None => return None
        }
        i = order
        while (i < n) {
          val p = order match {
            case 0 => 0
            case 1 => xs(i - 1)
            case 2 => 2 * xs(i - 1) - xs(i - 2)
            case 3 => 3 * xs(i - 1) - 3 * xs(i - 2) + xs(i - 3)
            case _ => 4 * xs(i - 1) - 6 * xs(i - 2) + 4 * xs(i - 3) - xs(i - 4)
          }
          xs(i) = p + res(i - order)
          i += 1
        }
        xs
      } else if ((t & 0x20) != 0) { // LPC, order 1..32
        val order = (t & 0x1F) + 1
        if (order > n) return None
        val xs = new Array[Int](n)
        var i = 0
        while (i < order) { xs(i) = br.signedBits(eb); i += 1 }
        val prec = br.bits(4).toInt + 1
        if (prec > 15) return None
        val shift = br.signedBits(5)
        if (shift < 0) return None
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = br.signedBits(prec); i += 1 }
        val res = decodeResidual(br, n, order) match {
          case Some(r) => r; case None => return None
        }
        i = order
        while (i < n) {
          var acc = 0L; var j = 0
          while (j < order) { acc += coefs(j).toLong * xs(i - 1 - j); j += 1 }
          xs(i) = ((acc >> shift) + res(i - order)).toInt
          i += 1
        }
        xs
      } else return None
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    Some(out)
  }

  private def decodeResidual(br: BitReader, n: Int, order: Int): Option[Array[Int]] = {
    val method = br.bits(2).toInt
    if (method > 1) return None
    val pbits = if (method == 0) 4 else 5
    val escape = (1 << pbits) - 1
    val partOrder = br.bits(4).toInt
    if ((n >> partOrder) << partOrder != n) return None
    val res = new Array[Int](n - order)
    var idx = 0; var p = 0
    while (p < (1 << partOrder)) {
      val cnt = (n >> partOrder) - (if (p == 0) order else 0)
      if (cnt < 0) return None
      val param = br.bits(pbits).toInt
      if (param == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < cnt) {
          res(idx) = if (raw == 0) 0 else br.signedBits(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          var q = 0L
          while (br.bit() == 0) q += 1
          val r = if (param == 0) 0L else br.bits(param)
          val zz = (q << param) | r
          res(idx) = ((zz >>> 1) ^ -(zz & 1L)).toInt
          idx += 1; i += 1
        }
      }
      p += 1
    }
    Some(res)
  }

  // -------------------------------------------------------------- encode

  /** Deterministic REAL FLAC stream for a key — the m04 WAV shape
    * re-expressed through the compressed container: `1 + id%2` channels
    * at 8 kHz, `100 + id%50` frames, sample
    * `(id·31 + i·7 + ch·13) % 4096 − 2048`, split into 64-sample blocks
    * (last partial). Encoding choices vary so every decode branch is
    * driven by real streams:
    *  - stereo ids: `id%4 == 3` → MID/SIDE decorrelation (side at 17
    *    bits), else independent channels
    *  - subframe type `(id + frame + ch) % 4`: 0 → FIXED order 2 (Rice,
    *    4-bit params, partition order 1 on full even-keyed blocks),
    *    1 → LPC order 2 (coefs [2,−1], shift 0 — Rice 5-bit params),
    *    2 → VERBATIM, 3 → FIXED order 1 with the raw-bits ESCAPE code
    *  - CRC-8/CRC-16 computed for real, so the decoder's checks bite.
    * Lossless: the decoded PCM equals the planted formula exactly, which
    * is what the m17 oracle replays in closed form. */
  def syntheticFlac(id: Long): Array[Byte] = {
    val nc = (1 + id % 2).toInt
    val nf = (100 + id % 50).toInt
    def sample(ch: Int, i: Int): Int =
      (((id * 31 + i * 7 + ch * 13) % 4096) - 2048).toInt
    val midSide = nc == 2 && id % 4 == 3
    val blockSizes = {
      val bs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var rem = nf
      while (rem > 0) { val b = math.min(64, rem); bs += b; rem -= b }
      bs.toSeq
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (type 0, last-metadata flag set), 34 bytes
    val si = new Array[Byte](34)
    // RFC 9639 §8.2: the STREAMINFO min/max block size EXCLUDE the final
    // (possibly partial) block and min must be >= 16 — so count only the
    // non-final blocks (all 64 here); a hypothetical single-block stream
    // clamps to the 16-sample floor.
    val fullBlocks = blockSizes.dropRight(1)
    val minB = if (fullBlocks.isEmpty) math.max(16, blockSizes.head)
               else fullBlocks.min
    val maxB = if (fullBlocks.isEmpty) math.max(16, blockSizes.head)
               else fullBlocks.max
    si(0) = (minB >> 8).toByte; si(1) = minB.toByte
    si(2) = (maxB >> 8).toByte; si(3) = maxB.toByte
    // min/max frame size left 0 (unknown) — bytes 4..9
    val rate = 8000
    si(10) = (rate >> 12).toByte
    si(11) = ((rate >> 4) & 0xFF).toByte
    si(12) = (((rate & 0xF) << 4) | ((nc - 1) << 1) | ((16 - 1) >> 4)).toByte
    si(13) = ((((16 - 1) & 0xF) << 4) | ((nf.toLong >> 32) & 0xF)).toByte
    si(14) = ((nf >> 24) & 0xFF).toByte; si(15) = ((nf >> 16) & 0xFF).toByte
    si(16) = ((nf >> 8) & 0xFF).toByte; si(17) = (nf & 0xFF).toByte
    // md5 left zero (unset) — bytes 18..33
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si)
    var start = 0
    blockSizes.zipWithIndex.foreach { case (bs, bi) =>
      out.write(encodeFrame(id, bi, bs, start, nc, midSide, sample))
      start += bs
    }
    out.toByteArray
  }

  private def encodeFrame(id: Long, bi: Int, bs: Int, start: Int, nc: Int,
                          midSide: Boolean, sample: (Int, Int) => Int): Array[Byte] = {
    val bw = new BitWriter
    bw.bits(0x3FFE, 14) // sync
    bw.bit(0) // reserved
    bw.bit(0) // fixed blocking strategy
    bw.bits(6, 4) // block size: 8-bit value at header end
    bw.bits(0, 4) // sample rate: from STREAMINFO
    val chAsn = if (nc == 1) 0 else if (midSide) 10 else 1
    bw.bits(chAsn, 4)
    bw.bits(4, 3) // 16 bits/sample
    bw.bit(0) // reserved
    bw.bits(bi.toLong, 8) // UTF-8 frame number (single byte: ≤3 frames)
    bw.bits((bs - 1).toLong, 8)
    bw.bits(crc8(bw.snapshot, 0, 6).toLong, 8)
    val coded: Array[Array[Int]] =
      if (nc == 1) Array(Array.tabulate(bs)(i => sample(0, start + i)))
      else {
        val l = Array.tabulate(bs)(i => sample(0, start + i))
        val r = Array.tabulate(bs)(i => sample(1, start + i))
        if (midSide)
          Array(Array.tabulate(bs)(i => (l(i) + r(i)) >> 1),
            Array.tabulate(bs)(i => l(i) - r(i)))
        else Array(l, r)
      }
    var ch = 0
    while (ch < coded.length) {
      val bps = if (midSide && ch == 1) 17 else 16
      writeSubframe(bw, coded(ch), bps, ((id + bi + ch) % 4).toInt, id, bi)
      ch += 1
    }
    bw.align()
    val body = bw.snapshot
    bw.bits(crc16(body, 0, body.length).toLong, 16)
    bw.snapshot
  }

  private def mask(n: Int): Long = (1L << n) - 1

  private def writeSubframe(bw: BitWriter, xs: Array[Int], bps: Int,
                            t0: Int, id: Long, bi: Int): Unit = {
    val bs = xs.length
    val t = if (bs < 4) 2 else t0 // tiny tail blocks: verbatim
    bw.bit(0)
    t match {
      case 2 => // verbatim
        bw.bits(1, 6); bw.bit(0)
        xs.foreach(v => bw.bits(v.toLong & mask(bps), bps))
      case 0 | 3 => // fixed order 2 / fixed order 1 + escape residual
        val order = if (t == 0) 2 else 1
        bw.bits((8 + order).toLong, 6); bw.bit(0)
        var i = 0
        while (i < order) { bw.bits(xs(i).toLong & mask(bps), bps); i += 1 }
        val res = Array.tabulate(bs - order) { j =>
          val k = j + order
          if (order == 2) xs(k) - 2 * xs(k - 1) + xs(k - 2)
          else xs(k) - xs(k - 1)
        }
        if (t == 3) { // raw-bits escape: 15 bits covers ±8190 side deltas
          bw.bits(0, 2); bw.bits(0, 4)
          bw.bits(15, 4); bw.bits(15, 5)
          res.foreach(e => bw.bits(e.toLong & mask(15), 15))
        } else {
          val param = if (bps == 17) 14 else 13
          val partOrder = if (bs == 64 && (id + bi) % 2 == 0) 1 else 0
          writeRice(bw, res, order, bs, method = 0, param, partOrder)
        }
      case _ => // LPC order 2 = the fixed-2 predictor spelled as LPC
        bw.bits(0x20 | (2 - 1), 6); bw.bit(0)
        bw.bits(xs(0).toLong & mask(bps), bps)
        bw.bits(xs(1).toLong & mask(bps), bps)
        bw.bits(4 - 1, 4) // precision 4
        bw.bits(0, 5) // shift 0
        bw.bits(2L & 0xF, 4) // coef 2
        bw.bits(-1L & 0xF, 4) // coef -1
        val res = Array.tabulate(bs - 2) { j =>
          val k = j + 2; xs(k) - (2 * xs(k - 1) - xs(k - 2))
        }
        writeRice(bw, res, 2, bs, method = 1,
          param = if (bps == 17) 14 else 13, partOrder = 0)
    }
  }

  private def writeRice(bw: BitWriter, res: Array[Int], order: Int, bs: Int,
                        method: Int, param: Int, partOrder: Int): Unit = {
    bw.bits(method.toLong, 2)
    bw.bits(partOrder.toLong, 4)
    val pbits = if (method == 0) 4 else 5
    var idx = 0; var p = 0
    while (p < (1 << partOrder)) {
      val cnt = (bs >> partOrder) - (if (p == 0) order else 0)
      bw.bits(param.toLong, pbits)
      var i = 0
      while (i < cnt) {
        val e = res(idx); idx += 1
        val zz = ((e << 1) ^ (e >> 31)).toLong & 0xFFFFFFFFL
        val q = (zz >>> param).toInt
        var k = 0
        while (k < q) { bw.bit(0); k += 1 }
        bw.bit(1)
        bw.bits(zz & mask(param), param)
        i += 1
      }
      p += 1
    }
  }

  /** Media table of REAL FLAC payloads from any keyed table — the
    * compressed-audio complement of [[Multimodal.syntheticMedia]]'s WAV
    * rows (same metadata contract). */
  def syntheticFlacTable(keys: DataFrame, idCol: String): DataFrame = {
    val payload = udf((id: Long) => syntheticFlac(id))
    keys.select(col(idCol).cast("long").as("media_id"))
      .withColumn("payload", payload(col("media_id")))
      .withColumn("meta", struct(
        lit("audio").as("media_type"), lit("flac").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
  }
}
