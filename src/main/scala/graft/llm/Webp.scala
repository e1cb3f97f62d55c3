package graft.llm

/**
 * WebP-LOSSLESS (VP8L) decode + a deterministic synthetic encoder — the
 * highest-volume real crawl image format after JPEG/PNG. Implemented from
 * the public spec (RFC 9649 "WebP Image Format", §3 RIFF container and §5
 * VP8L lossless bitstream): LSB-first bit reader, canonical prefix codes
 * (simple and code-length-coded, DEFLATE-style MSB-first code packing),
 * color cache (hash 0x1e35a7bd), meta prefix-code groups, LZ77 backward
 * references with the 120-entry 2D distance map, and all four transforms
 * (predictor 0–13, color, subtract-green, color-indexing with sub-byte
 * pixel bundling), inverted in reverse read order.
 *
 * Contract matches every other codec here (CodecFuzzSpec): decode returns
 * `Some((w, h, rgb24))` or `None` — NEVER throws, whatever the bytes. At
 * 100 TB some byte pattern will hit every branch; a throw in a narrow
 * decode map kills the task.
 *
 * The synthetic encoder plants closed-form pixels behind six REAL VP8L
 * encodings (plain+color-cache, subtract-green, 4-color palette with
 * 2-bit bundling, LZ77 row copies, predictor transform, color transform)
 * so the m28 oracle replays decoded channel sums per variant in SQL.
 */
object Webp {

  // ------------------------------------------------------------------
  // bit IO: LSB-first within bytes; prefix-code bits packed MSB-of-code
  // first (the DEFLATE convention VP8L shares)
  // ------------------------------------------------------------------

  private final class Malformed(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new Malformed(msg)

  private final class Br(data: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) bad("bitstream truncated")
        v |= (((data(pos) >> bit) & 1) << i)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def bit1(): Int = bits(1)
  }

  private final class Bw {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= (((v >> i) & 1) << nb)
        nb += 1
        if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
        i += 1
      }
    }
    /** prefix-code bits: MSB of the code first. */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((c >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nb > 0) { buf.write(cur); cur = 0; nb = 0 }
      buf.toByteArray
    }
  }

  // ------------------------------------------------------------------
  // canonical prefix codes (RFC 9649 §5.2; DEFLATE assignment)
  // ------------------------------------------------------------------

  /** code of each symbol from its length (0 = absent), canonical order
    * (shorter first, ties by symbol index). */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.foldLeft(0)(math.max)
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val next = new Array[Int](maxLen + 1)
    var c = 0
    var l = 1
    while (l <= maxLen) { c = (c + blCount(l - 1)) << 1; next(l) = c; l += 1 }
    lengths.map { len =>
      if (len == 0) 0 else { val v = next(len); next(len) += 1; v }
    }
  }

  /** Bit-walk decoder over canonical codes; max code length 15. A single
    * nonzero-length symbol decodes with ZERO bits (the simple-code and
    * trivial-tree case). */
  private final class PrefixDec(lengths: Array[Int]) {
    private val nonzero = lengths.indices.filter(lengths(_) > 0)
    private val single = if (nonzero.length == 1) nonzero.head else -1
    if (nonzero.isEmpty) bad("prefix code with no symbols")
    private val maxLen = lengths.foldLeft(0)(math.max)
    if (maxLen > 15) bad(s"code length $maxLen > 15")
    // symbols sorted by (length, index) + first code / offset per length
    private val sorted = nonzero.sortBy(s => (lengths(s), s)).toArray
    private val count = new Array[Int](maxLen + 1)
    nonzero.foreach(s => count(lengths(s)) += 1)
    private val first = new Array[Int](maxLen + 1)
    private val offset = new Array[Int](maxLen + 1)
    locally {
      var c = 0; var off = 0; var l = 1
      while (l <= maxLen) {
        c = (c + (if (l >= 2) count(l - 1) else 0)) << 1
        first(l) = c
        offset(l) = off
        off += count(l)
        l += 1
      }
    }
    def next(br: Br): Int = {
      if (single >= 0) return single
      var c = 0
      var l = 0
      while (l < maxLen) {
        c = (c << 1) | br.bit1()
        l += 1
        if (count(l) > 0 && c - first(l) < count(l) && c >= first(l))
          return sorted(offset(l) + c - first(l))
      }
      bad("invalid prefix code")
    }
  }

  // ------------------------------------------------------------------
  // LZ77 length/distance prefix values and the 2D distance map
  // ------------------------------------------------------------------

  private def readPrefixValue(code: Int, br: Br): Int =
    if (code < 4) code + 1
    else {
      val eb = (code - 2) >> 1
      val off = (2 + (code & 1)) << eb
      off + br.bits(eb) + 1
    }

  /** inverse of [[readPrefixValue]]: value → (code, extraBits, extraVal) */
  private def valueToPrefix(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"prefix value $v")
    if (v <= 4) (v - 1, 0, 0)
    else {
      var code = 4
      while (code < 40) {
        val eb = (code - 2) >> 1
        val off = (2 + (code & 1)) << eb
        if (v >= off + 1 && v <= off + (1 << eb)) return (code, eb, v - off - 1)
        code += 1
      }
      sys.error(s"prefix value $v out of range")
    }
  }

  /** RFC 9649 §5.5.2: distance codes 1..120 map to 2D pixel offsets. */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def mapDistance(dCode: Int, w: Int): Int =
    if (dCode > 120) dCode - 120
    else {
      val (dx, dy) = DistMap(dCode - 1)
      val d = dy * w + dx
      if (d < 1) 1 else d
    }

  // ------------------------------------------------------------------
  // color cache + pixel helpers (pixels are Int ARGB)
  // ------------------------------------------------------------------

  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  private def addPixels(a: Int, b: Int): Int = {
    val al = ((a >>> 24) + (b >>> 24)) & 0xFF
    val r = (((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF
    val g = (((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF
    val bl = ((a & 0xFF) + (b & 0xFF)) & 0xFF
    (al << 24) | (r << 16) | (g << 8) | bl
  }

  private def subPixels(a: Int, b: Int): Int = {
    val al = ((a >>> 24) - (b >>> 24)) & 0xFF
    val r = (((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF
    val g = (((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF
    val bl = ((a & 0xFF) - (b & 0xFF)) & 0xFF
    (al << 24) | (r << 16) | (g << 8) | bl
  }

  private def average2(a: Int, b: Int): Int = {
    val al = ((a >>> 24) + (b >>> 24)) / 2
    val r = (((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) / 2
    val g = (((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) / 2
    val bl = ((a & 0xFF) + (b & 0xFF)) / 2
    (al << 24) | (r << 16) | (g << 8) | bl
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    val pA = (l >>> 24) + (t >>> 24) - (tl >>> 24)
    val pR = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    val pG = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    val pB = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    val dL = math.abs(pA - (l >>> 24)) + math.abs(pR - ((l >> 16) & 0xFF)) +
      math.abs(pG - ((l >> 8) & 0xFF)) + math.abs(pB - (l & 0xFF))
    val dT = math.abs(pA - (t >>> 24)) + math.abs(pR - ((t >> 16) & 0xFF)) +
      math.abs(pG - ((t >> 8) & 0xFF)) + math.abs(pB - (t & 0xFF))
    if (dL < dT) l else t
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int =
      clamp255(((l >>> sh) & 0xFF) + ((t >>> sh) & 0xFF) - ((tl >>> sh) & 0xFF))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubHalf(ave: Int, tl: Int): Int = {
    def ch(sh: Int): Int = {
      val a = (ave >>> sh) & 0xFF
      val b = (tl >>> sh) & 0xFF
      clamp255(a + (a - b) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  /** ((int8)t * (int8)c) >> 5 — the color-transform delta (RFC §4.2.2). */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte.toInt * c.toByte.toInt) >> 5

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  private def subSize(s: Int, bits: Int): Int = (s + (1 << bits) - 1) >> bits

  private final case class Xf(tpe: Int, bits: Int, data: Array[Int],
                              dataW: Int, origW: Int)

  /** One VP8L-coded image stream (RFC §5.6): transforms (top level only),
    * color-cache info, optional meta prefix image, prefix-code groups,
    * LZ77-coded pixels, inverse transforms. Returns (finalWidth, argb). */
  private def decodeImageStream(br: Br, w0: Int, h: Int,
                                top: Boolean): (Int, Array[Int]) = {
    var w = w0
    val xforms = scala.collection.mutable.ArrayBuffer.empty[Xf]
    if (top) {
      var seen = Set.empty[Int]
      while (br.bit1() == 1) {
        val t = br.bits(2)
        if (seen(t)) bad(s"transform $t repeated")
        seen += t
        t match {
          case 0 | 1 => // predictor / color: block-mode sub-image
            val sb = br.bits(3) + 2
            val bw = subSize(w, sb)
            val bh = subSize(h, sb)
            val (_, data) = decodeImageStream(br, bw, bh, top = false)
            xforms += Xf(t, sb, data, bw, w)
          case 2 =>
            xforms += Xf(2, 0, null, 0, w)
          case 3 =>
            val psize = br.bits(8) + 1
            val (_, raw) = decodeImageStream(br, psize, 1, top = false)
            val palette = new Array[Int](psize)
            var i = 0
            while (i < psize) {
              palette(i) = if (i == 0) raw(0) else addPixels(palette(i - 1), raw(i))
              i += 1
            }
            val wb = if (psize <= 2) 3 else if (psize <= 4) 2
              else if (psize <= 16) 1 else 0
            xforms += Xf(3, wb, palette, psize, w)
            w = subSize(w, wb) // subsequent reads see the bundled width
        }
      }
    }
    // color-cache info
    val cacheBits =
      if (br.bit1() == 1) {
        val cb = br.bits(4)
        if (cb < 1 || cb > 11) bad(s"color cache bits $cb")
        cb
      } else 0
    // meta prefix-code image (top level only)
    var meta: Array[Int] = null
    var metaW = 0
    var metaBits = 0
    var numGroups = 1
    if (top && br.bit1() == 1) {
      metaBits = br.bits(3) + 2
      val mw = subSize(w, metaBits)
      val mh = subSize(h, metaBits)
      val (_, m) = decodeImageStream(br, mw, mh, top = false)
      meta = m
      metaW = mw
      var g = 0
      m.foreach { p =>
        val idx = (((p >> 16) & 0xFF) << 8) | ((p >> 8) & 0xFF)
        if (idx > g) g = idx
      }
      numGroups = g + 1
      if (numGroups > 1024) bad(s"meta groups $numGroups")
    }
    // prefix-code groups: 5 codes each (green+len+cache, red, blue, alpha, dist)
    val greenAlpha = 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0)
    val groups = Array.fill(numGroups) {
      Array(readPrefixCode(br, greenAlpha), readPrefixCode(br, 256),
        readPrefixCode(br, 256), readPrefixCode(br, 256),
        readPrefixCode(br, 40))
    }
    // pixel loop
    val n = w.toLong * h
    if (n > (1L << 26)) bad(s"image too large: ${w}x$h")
    val out = new Array[Int](n.toInt)
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    var pos = 0
    var x = 0
    var y = 0
    while (pos < n) {
      val grp =
        if (meta == null) groups(0)
        else {
          val mp = meta((y >> metaBits) * metaW + (x >> metaBits))
          val gi = (((mp >> 16) & 0xFF) << 8) | ((mp >> 8) & 0xFF)
          groups(gi)
        }
      val s = grp(0).next(br)
      if (s < 256) {
        val r = grp(1).next(br)
        val b = grp(2).next(br)
        val a = grp(3).next(br)
        val px = (a << 24) | (r << 16) | (s << 8) | b
        out(pos) = px
        if (cache != null) cache(cacheHash(px, cacheBits)) = px
        pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
      } else if (s < 280) {
        val len = readPrefixValue(s - 256, br)
        val dCode = readPrefixValue(grp(4).next(br), br)
        val dist = mapDistance(dCode, w)
        if (dist > pos || pos + len > n) bad("backward reference out of range")
        var i = 0
        while (i < len) {
          val px = out(pos - dist)
          out(pos) = px
          if (cache != null) cache(cacheHash(px, cacheBits)) = px
          pos += 1
          i += 1
        }
        x = pos % w
        y = pos / w
      } else {
        if (cache == null || s - 280 >= cache.length) bad(s"cache index $s")
        val px = cache(s - 280)
        out(pos) = px
        pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
      }
    }
    // inverse transforms, reverse read order
    var curW = w
    var cur = out
    xforms.reverseIterator.foreach { xf =>
      xf.tpe match {
        case 3 =>
          cur = inverseColorIndexing(cur, curW, h, xf)
          curW = xf.origW
        case 2 =>
          var i = 0
          while (i < cur.length) {
            val p = cur(i)
            val g = (p >> 8) & 0xFF
            val r = (((p >> 16) & 0xFF) + g) & 0xFF
            val b = ((p & 0xFF) + g) & 0xFF
            cur(i) = (p & 0xFF000000) | (r << 16) | (g << 8) | b
            i += 1
          }
        case 1 =>
          inverseColorTransform(cur, curW, h, xf)
        case 0 =>
          inversePredictor(cur, curW, h, xf)
      }
    }
    (curW, cur)
  }

  private def inverseColorIndexing(coded: Array[Int], codedW: Int, h: Int,
                                   xf: Xf): Array[Int] = {
    val wb = xf.bits
    val palette = xf.data
    val w = xf.origW
    val out = new Array[Int](w * h)
    val bpp = 8 >> wb
    val mask = (1 << bpp) - 1
    val xmask = (1 << wb) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val packed = (coded(y * codedW + (x >> wb)) >> 8) & 0xFF
        val idx = (packed >> ((x & xmask) * bpp)) & mask
        out(y * w + x) = if (idx < palette.length) palette(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  private def inverseColorTransform(px: Array[Int], w: Int, h: Int, xf: Xf): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = xf.data((y >> xf.bits) * xf.dataW + (x >> xf.bits))
        val g2r = cte & 0xFF          // blue channel
        val g2b = (cte >> 8) & 0xFF   // green channel
        val r2b = (cte >> 16) & 0xFF  // red channel
        val p = px(y * w + x)
        val g = (p >> 8) & 0xFF
        val r = (((p >> 16) & 0xFF) + ctDelta(g2r, g)) & 0xFF
        val b = ((p & 0xFF) + ctDelta(g2b, g) + ctDelta(r2b, r)) & 0xFF
        px(y * w + x) = (p & 0xFF000000) | (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
  }

  private def inversePredictor(px: Array[Int], w: Int, h: Int, xf: Xf): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xFF000000
          else if (y == 0) px(y * w + x - 1) // first row: L
          else if (x == 0) px((y - 1) * w)   // first column: T
          else {
            val mode = (xf.data((y >> xf.bits) * xf.dataW + (x >> xf.bits)) >> 8) & 0xFF
            if (mode > 13) bad(s"predictor mode $mode")
            val l = px(y * w + x - 1)
            val t = px((y - 1) * w + x)
            val tl = px((y - 1) * w + x - 1)
            // TR of the rightmost column wraps to the current row's first
            // (already reconstructed) pixel — the in-memory-layout rule the
            // format codifies (RFC 9649 §4.2.1)
            val tr = if (x == w - 1) px(y * w) else px((y - 1) * w + x + 1)
            mode match {
              case 0 => 0xFF000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => average2(average2(l, tr), t)
              case 6 => average2(l, tl)
              case 7 => average2(l, t)
              case 8 => average2(tl, t)
              case 9 => average2(t, tr)
              case 10 => average2(average2(l, tl), average2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => clampAddSubFull(l, t, tl)
              case 13 => clampAddSubHalf(average2(l, t), tl)
            }
          }
        px(y * w + x) = addPixels(px(y * w + x), pred)
        x += 1
      }
      y += 1
    }
  }

  /** kCodeLengthCodeOrder (RFC §5.2.2). */
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code: simple (1–2 symbols) or code-length-coded. */
  private def readPrefixCode(br: Br, alphabetSize: Int): PrefixDec = {
    if (br.bit1() == 1) {
      // simple
      val numSym = br.bit1() + 1
      val first =
        if (br.bit1() == 1) br.bits(8) else br.bits(1)
      val lengths = new Array[Int](alphabetSize)
      if (first >= alphabetSize) bad(s"simple symbol $first")
      if (numSym == 1) lengths(first) = 1 // decoded as a 0-bit code
      else {
        val second = br.bits(8)
        if (second >= alphabetSize || second == first) bad(s"simple symbol $second")
        lengths(first) = 1
        lengths(second) = 1
      }
      new PrefixDec(lengths)
    } else {
      val numCodes = 4 + br.bits(4)
      if (numCodes > 19) bad(s"num code lengths $numCodes")
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCodes) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val clDec = new PrefixDec(clLengths)
      var maxSymbol = alphabetSize
      if (br.bit1() == 1) {
        val lenNbits = 2 + 2 * br.bits(3)
        maxSymbol = 2 + br.bits(lenNbits)
        if (maxSymbol > alphabetSize) bad(s"max symbol $maxSymbol")
      }
      val lengths = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clDec.next(br)
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          if (cl != 0) prev = cl
        } else if (cl == 16) {
          val rep = 3 + br.bits(2)
          var j = 0
          while (j < rep && sym < alphabetSize) { lengths(sym) = prev; sym += 1; j += 1 }
        } else if (cl == 17) {
          sym += 3 + br.bits(3)
        } else { // 18
          sym += 11 + br.bits(7)
        }
        if (sym > alphabetSize) bad("code lengths overrun alphabet")
      }
      new PrefixDec(lengths)
    }
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)

  /**
   * Decode a lossless WebP: RIFF walk to the VP8L chunk (skipping VP8X
   * and metadata chunks), then the full VP8L bitstream. Lossy VP8 and
   * anything malformed → None, never a throw.
   * @return (width, height, RGB24 bytes) — alpha dropped like every
   *         other decoder feeding [[Multimodal.imageStats]].
   */
  def decodeWebp(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    if (payload == null || payload.length < 21) return None
    if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
        payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'E' &&
        payload(10) == 'B' && payload(11) == 'P')) return None
    var off = 12
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= payload.length && dataOff < 0) {
      val len = le32(payload, off + 4)
      if (len < 0 || off + 8 + len > payload.length) return None
      if (payload(off) == 'V' && payload(off + 1) == 'P' &&
          payload(off + 2) == '8' && payload(off + 3) == 'L') {
        dataOff = off + 8
        dataLen = len
      } else off += 8 + len + (len & 1)
    }
    if (dataOff < 0 || dataLen < 5) return None
    if ((payload(dataOff) & 0xFF) != 0x2F) return None
    val br = new Br(payload, dataOff + 1,
      math.min(payload.length, dataOff + dataLen))
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bit1() // alpha hint
    if (br.bits(3) != 0) return None // version
    val (fw, argb) = decodeImageStream(br, w, h, top = true)
    if (fw != w || argb.length != w * h) return None
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val p = argb(i)
      rgb(i * 3) = ((p >> 16) & 0xFF).toByte
      rgb(i * 3 + 1) = ((p >> 8) & 0xFF).toByte
      rgb(i * 3 + 2) = (p & 0xFF).toByte
      i += 1
    }
    Some((w, h, rgb))
  } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------
  // synthetic encoder (closed-form fixtures for the m28 gate + specs)
  // ------------------------------------------------------------------

  private final class TreeEnc(lengths: Array[Int]) {
    private val codes = canonicalCodes(lengths)
    private val single = {
      val nz = lengths.indices.filter(lengths(_) > 0)
      nz.length == 1
    }
    def emit(bw: Bw, sym: Int): Unit =
      if (!single) bw.code(codes(sym), lengths(sym)) // 1-symbol codes are 0 bits
  }

  /** Complete two-level canonical lengths over `used` (ascending). */
  private def buildLengths(used: Seq[Int], alphabetSize: Int): Array[Int] = {
    val lengths = new Array[Int](alphabetSize)
    val n = used.size
    if (n == 1) { lengths(used.head) = 1; return lengths }
    val big = 32 - Integer.numberOfLeadingZeros(n - 1) // ceil log2 n
    val atSmall = (1 << big) - n // Kraft-complete: this many at length big-1
    used.zipWithIndex.foreach { case (s, i) =>
      lengths(s) = if (i < atSmall) big - 1 else big
    }
    lengths
  }

  private def writeTree(bw: Bw, lengths: Array[Int], alphabetSize: Int): Unit = {
    val used = lengths.indices.filter(lengths(_) > 0)
    if (used.length == 1 && used.head <= 255) {
      bw.bits(1, 1); bw.bits(0, 1) // simple, 1 symbol
      val s = used.head
      if (s < 2) { bw.bits(0, 1); bw.bits(s, 1) }
      else { bw.bits(1, 1); bw.bits(s, 8) }
      return
    }
    if (used.length == 2 && used(1) <= 255 &&
        lengths(used(0)) == 1 && lengths(used(1)) == 1) {
      bw.bits(1, 1); bw.bits(1, 1) // simple, 2 symbols
      val s0 = used(0)
      if (s0 < 2) { bw.bits(0, 1); bw.bits(s0, 1) }
      else { bw.bits(1, 1); bw.bits(s0, 8) }
      bw.bits(used(1), 8)
      return
    }
    // normal: code-length-coded over the full alphabet (trailing zeros
    // explicit — we write the no-max-symbol form)
    bw.bits(0, 1)
    val toks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < alphabetSize) {
      if (lengths(i) > 0) { toks += ((lengths(i), 0, 0)); i += 1 }
      else {
        var run = 0
        while (i + run < alphabetSize && lengths(i + run) == 0) run += 1
        var r = run
        while (r >= 11) { val take = math.min(r, 138); toks += ((18, 7, take - 11)); r -= take }
        if (r >= 3) { toks += ((17, 3, r - 3)); r = 0 }
        while (r > 0) { toks += ((0, 0, 0)); r -= 1 }
        i += run
      }
    }
    var clUsed = toks.map(_._1).distinct.sorted
    if (clUsed.size == 1) // a 1-symbol cl code would be 0-bit; pad with a dummy
      clUsed = (clUsed :+ (if (clUsed.head == 0) 1 else 0)).sorted
    val clLengths = buildLengths(clUsed.toSeq, 19)
    val numCodes = math.max(4,
      ClOrder.indices.filter(j => clLengths(ClOrder(j)) > 0).max + 1)
    bw.bits(numCodes - 4, 4)
    var j = 0
    while (j < numCodes) { bw.bits(clLengths(ClOrder(j)), 3); j += 1 }
    bw.bits(0, 1) // no max-symbol shortcut
    val clEnc = new TreeEnc(clLengths)
    toks.foreach { case (s, eb, ev) =>
      clEnc.emit(bw, s)
      if (eb > 0) bw.bits(ev, eb)
    }
  }

  private sealed trait Tok
  private final case class Lit(argb: Int) extends Tok
  /** LZ77 copy; `distValue` is the PRE-MAPPING distance code value. */
  private final case class Cpy(len: Int, distValue: Int) extends Tok

  /** One entropy-coded image: cache info, (top) no-meta bit, 5 prefix
    * codes, token emissions. Mirrors [[decodeImageStream]] bit for bit. */
  private def writeImageStream(bw: Bw, toks: Seq[Tok], w: Int,
                               top: Boolean, cacheBits: Int): Unit = {
    final case class Em(tree: Int, sym: Int, eb: Int, ev: Int)
    val ems = scala.collection.mutable.ArrayBuffer.empty[Em]
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val hist = scala.collection.mutable.ArrayBuffer.empty[Int]
    def insert(px: Int): Unit = {
      if (cache != null) cache(cacheHash(px, cacheBits)) = px
      hist += px
    }
    toks.foreach {
      case Lit(px) =>
        if (cache != null && cache(cacheHash(px, cacheBits)) == px) {
          ems += Em(0, 280 + cacheHash(px, cacheBits), 0, 0)
          insert(px)
        } else {
          ems += Em(0, (px >> 8) & 0xFF, 0, 0)
          ems += Em(1, (px >> 16) & 0xFF, 0, 0)
          ems += Em(2, px & 0xFF, 0, 0)
          ems += Em(3, px >>> 24, 0, 0)
          insert(px)
        }
      case Cpy(len, dv) =>
        val (lc, leb, lev) = valueToPrefix(len)
        ems += Em(0, 256 + lc, leb, lev)
        val (dc, deb, dev) = valueToPrefix(dv)
        ems += Em(4, dc, deb, dev)
        val dist = mapDistance(dv, w)
        var i = 0
        while (i < len) { insert(hist(hist.length - dist)); i += 1 }
    }
    // header bits
    if (cacheBits > 0) { bw.bits(1, 1); bw.bits(cacheBits, 4) }
    else bw.bits(0, 1)
    if (top) bw.bits(0, 1) // no meta prefix image
    val alphaSizes = Array(
      256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0), 256, 256, 256, 40)
    val treeLengths = (0 until 5).map { t =>
      val used = ems.filter(_.tree == t).map(_.sym).distinct.sorted
      buildLengths(if (used.isEmpty) Seq(0) else used.toSeq, alphaSizes(t))
    }
    treeLengths.zipWithIndex.foreach { case (l, t) => writeTree(bw, l, alphaSizes(t)) }
    val encs = treeLengths.map(new TreeEnc(_))
    ems.foreach { em =>
      encs(em.tree).emit(bw, em.sym)
      if (em.eb > 0) bw.bits(em.ev, em.eb)
    }
  }

  /**
   * Deterministic lossless WebP for a key — REAL VP8L bitstreams, one of
   * six encodings by `id % 6`, all decoding to closed-form pixels an
   * external engine replays (alpha always 255; dims 8+id%9 × 5+id%5):
   *
   *  - v0 plain literals + 16-entry COLOR CACHE (x%4-periodic rows, so
   *    cache hits dominate); pixels (id·7+y·11+(x%4)·13, +17, +34) % 256
   *  - v1 SUBTRACT-GREEN transform; pixels (id·7+y·11+x·13, +17, +34)%256
   *  - v2 COLOR-INDEXING: 4-color delta-coded palette, 2-bit bundled
   *    pixels; index (id+x+2y)%4, palette c → (id·5+c·31, id·3+c·47,
   *    id·11+c·61) % 256
   *  - v3 LZ77: row 0 literal, every other row one backward reference
   *    (2D distance code (0,1)); pixels (id·7+x·13, +17, +34) % 256
   *  - v4 PREDICTOR transform, mode 1 (left), one 16-px block; v1 pixels
   *  - v5 COLOR transform (g2r=24, g2b=13, r2b=7), one block; v1 pixels
   */
  def syntheticWebp(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (5 + id % 5).toInt
    val v = (id % 6).toInt
    def base(x: Int, y: Int): Int = {
      val r = ((id * 7 + y * 11 + x * 13) % 256).toInt
      val g = ((id * 7 + y * 11 + x * 13 + 17) % 256).toInt
      val b = ((id * 7 + y * 11 + x * 13 + 34) % 256).toInt
      (255 << 24) | (r << 16) | (g << 8) | b
    }
    val bw = new Bw
    bw.bits(w - 1, 14); bw.bits(h - 1, 14)
    bw.bits(0, 1) // alpha hint
    bw.bits(0, 3) // version
    v match {
      case 0 =>
        bw.bits(0, 1) // no transforms
        val toks = for (y <- 0 until h; x <- 0 until w) yield Lit(base(x % 4, y))
        writeImageStream(bw, toks, w, top = true, cacheBits = 4)
      case 1 =>
        bw.bits(1, 1); bw.bits(2, 2) // subtract-green (no data)
        bw.bits(0, 1) // end of transforms
        val toks = for (y <- 0 until h; x <- 0 until w) yield {
          val p = base(x, y)
          val g = (p >> 8) & 0xFF
          val r = (((p >> 16) & 0xFF) - g) & 0xFF
          val b = ((p & 0xFF) - g) & 0xFF
          Lit((p & 0xFF000000) | (r << 16) | (g << 8) | b)
        }
        writeImageStream(bw, toks, w, top = true, cacheBits = 0)
      case 2 =>
        val psize = 4
        def pal(c: Int): Int = (255 << 24) |
          (((id * 5 + c * 31) % 256).toInt << 16) |
          (((id * 3 + c * 47) % 256).toInt << 8) |
          ((id * 11 + c * 61) % 256).toInt
        bw.bits(1, 1); bw.bits(3, 2) // color-indexing
        bw.bits(psize - 1, 8)
        val deltas = (0 until psize).map { i =>
          if (i == 0) pal(0) else subPixels(pal(i), pal(i - 1))
        }
        writeImageStream(bw, deltas.map(Lit(_)), psize, top = false, cacheBits = 0)
        bw.bits(0, 1) // end of transforms
        val widthBits = 2 // psize 4 → 4 pixels per byte, 2 bits each
        val bpp = 8 >> widthBits
        val codedW = subSize(w, widthBits)
        val toks = for (y <- 0 until h; cx <- 0 until codedW) yield {
          var packed = 0
          var k = 0
          while (k < (1 << widthBits) && (cx << widthBits) + k < w) {
            val x = (cx << widthBits) + k
            val idx = ((id + x + 2L * y) % 4).toInt
            packed |= idx << (k * bpp)
            k += 1
          }
          Lit(packed << 8)
        }
        writeImageStream(bw, toks, codedW, top = true, cacheBits = 0)
      case 3 =>
        bw.bits(0, 1) // no transforms
        def rowPx(x: Int): Int = {
          val r = ((id * 7 + x * 13) % 256).toInt
          val g = ((id * 7 + x * 13 + 17) % 256).toInt
          val b = ((id * 7 + x * 13 + 34) % 256).toInt
          (255 << 24) | (r << 16) | (g << 8) | b
        }
        val toks = (0 until w).map(x => Lit(rowPx(x))) ++
          Seq.fill(h - 1)(Cpy(w, 1)) // distance code 1 → 2D (0,1) → dist w
        writeImageStream(bw, toks, w, top = true, cacheBits = 0)
      case 4 =>
        bw.bits(1, 1); bw.bits(0, 2) // predictor
        bw.bits(2, 3) // size_bits 4: one 16-px block covers the image
        writeImageStream(bw, Seq(Lit(0xFF000000 | (1 << 8))), 1,
          top = false, cacheBits = 0) // mode 1 (left) in the green channel
        bw.bits(0, 1) // end of transforms
        val toks = for (y <- 0 until h; x <- 0 until w) yield {
          val p = base(x, y)
          val pred =
            if (x == 0 && y == 0) 0xFF000000
            else if (y == 0) base(x - 1, y)
            else if (x == 0) base(x, y - 1)
            else base(x - 1, y) // block mode 1 = left
          Lit(subPixels(p, pred))
        }
        writeImageStream(bw, toks, w, top = true, cacheBits = 0)
      case _ =>
        val g2r = 24; val g2b = 13; val r2b = 7
        bw.bits(1, 1); bw.bits(1, 2) // color transform
        bw.bits(2, 3) // size_bits 4
        val cte = (255 << 24) | (r2b << 16) | (g2b << 8) | g2r
        writeImageStream(bw, Seq(Lit(cte)), 1, top = false, cacheBits = 0)
        bw.bits(0, 1) // end of transforms
        val toks = for (y <- 0 until h; x <- 0 until w) yield {
          val p = base(x, y)
          val g = (p >> 8) & 0xFF
          val r0 = (p >> 16) & 0xFF
          val b0 = p & 0xFF
          val r = (r0 - ctDelta(g2r, g)) & 0xFF
          val b = (b0 - ctDelta(g2b, g) - ctDelta(r2b, r0)) & 0xFF
          Lit((p & 0xFF000000) | (r << 16) | (g << 8) | b)
        }
        writeImageStream(bw, toks, w, top = true, cacheBits = 0)
    }
    val stream = bw.toBytes
    // RIFF container: VP8L chunk = signature byte + bitstream
    val chunkLen = 1 + stream.length
    val pad = chunkLen & 1
    val riffLen = 4 + 8 + chunkLen + pad
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    tag("RIFF"); le(riffLen); tag("WEBP"); tag("VP8L"); le(chunkLen)
    out.write(0x2F); out.write(stream)
    if (pad == 1) out.write(0)
    out.toByteArray
  }
}
