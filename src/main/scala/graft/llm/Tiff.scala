package graft.llm

/**
 * TIFF decode + a deterministic synthetic encoder — with JPEG/PNG/WebP/GIF
 * this closes out the high-volume crawl image formats. Implemented from the
 * public TIFF 6.0 specification: both byte orders ("II"/"MM"), the IFD tag
 * walk, strip assembly, and the three baseline compressions real scanned
 * corpora carry — none (1), LZW (5, MSB-first codes with the spec's
 * early-change width bump, plus the horizontal-differencing predictor),
 * and PackBits (32773) — over grayscale, RGB, and palette-color images.
 *
 * Contract matches the codec family (CodecFuzzSpec): `Some((w, h, rgb24))`
 * or `None`, NEVER a throw, whatever the bytes. Size fields from untrusted
 * headers are bounds-checked before any allocation (the FLAC/MP4
 * corrupt-count lesson).
 */
object Tiff {

  private final class Malformed(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new Malformed(msg)

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** Parsed first-IFD view of a TIFF: byte order + tag accessors, shared
    * by the image decode, the raster decode, and the GeoTIFF georef. */
  private final class Ifd(payload: Array[Byte]) {
    if (payload == null || payload.length < 8) bad("too short")
    val le: Boolean =
      if (payload(0) == 'I' && payload(1) == 'I') true
      else if (payload(0) == 'M' && payload(1) == 'M') false
      else bad("byte order")
    def u16(o: Int): Int = {
      if (o < 0 || o + 2 > payload.length) bad(s"u16 at $o")
      if (le) (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
      else ((payload(o) & 0xFF) << 8) | (payload(o + 1) & 0xFF)
    }
    def u32(o: Int): Long = {
      if (o < 0 || o + 4 > payload.length) bad(s"u32 at $o")
      if (le) (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
        ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
      else ((payload(o) & 0xFFL) << 24) | ((payload(o + 1) & 0xFFL) << 16) |
        ((payload(o + 2) & 0xFFL) << 8) | (payload(o + 3) & 0xFFL)
    }
    if (u16(2) != 42) bad("magic")
    private val ifd = u32(4).toInt
    private val n = u16(ifd)
    if (n <= 0 || n > 512) bad(s"ifd entries $n")
    // tag -> (type, count, valueOffsetFieldPos)
    private var tags = Map.empty[Int, (Int, Long, Int)]
    locally {
      var i = 0
      while (i < n) {
        val e = ifd + 2 + i * 12
        tags += u16(e) -> ((u16(e + 2), u32(e + 4), e + 8))
        i += 1
      }
    }
    private def typeSize(t: Int): Int = t match {
      case 1 | 2 => 1; case 3 => 2; case 4 => 4; case 12 => 8
      case _ => bad(s"type $t")
    }
    /** tag values as longs (BYTE/SHORT/LONG arrays, inline or offset). */
    def values(tag: Int): Array[Long] = tags.get(tag) match {
      case None => Array.empty
      case Some((t, cnt, pos)) =>
        if (cnt < 0 || cnt > (1 << 20)) bad(s"tag $tag count $cnt")
        val sz = typeSize(t)
        val c = cnt.toInt
        val base = if (sz * c <= 4) pos else u32(pos).toInt
        Array.tabulate(c)(j => t match {
          case 3 => u16(base + j * 2).toLong
          case 4 => u32(base + j * 4)
          case 1 => (payload(base + j) & 0xFF).toLong
          case _ => bad(s"tag $tag type $t")
        })
    }
    /** DOUBLE (type 12) tag values — the GeoTIFF georeference tags. */
    def doubles(tag: Int): Array[Double] = tags.get(tag) match {
      case None => Array.empty
      case Some((t, cnt, pos)) =>
        if (t != 12) bad(s"tag $tag type $t, want DOUBLE")
        if (cnt < 0 || cnt > 4096) bad(s"tag $tag count $cnt")
        val base = u32(pos).toInt // 8-byte doubles are never inline
        Array.tabulate(cnt.toInt) { j =>
          var bits = 0L
          var k = 0
          while (k < 8) {
            val o = base + j * 8 + (if (le) 7 - k else k)
            if (o < 0 || o >= payload.length) bad("double oob")
            bits = (bits << 8) | (payload(o) & 0xFFL)
            k += 1
          }
          java.lang.Double.longBitsToDouble(bits)
        }
    }
    def scalar(tag: Int, dflt: Long = -1L): Long = {
      val v = values(tag)
      if (v.isEmpty) dflt else v(0)
    }
  }

  def decodeTiff(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    if (payload == null || payload.length < 8) return None
    if (!((payload(0) == 'I' && payload(1) == 'I') ||
        (payload(0) == 'M' && payload(1) == 'M'))) return None
    val ifd = new Ifd(payload)
    import ifd.{u32, values, scalar}
    val w = scalar(256).toInt
    val h = scalar(257).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    val compression = scalar(259, 1L).toInt
    val photometric = scalar(262).toInt
    val spp = scalar(277, 1L).toInt
    val bits = values(258)
    if (bits.nonEmpty && bits.exists(_ != 8L)) return None // 8-bit baseline
    if (spp != 1 && spp != 3) return None
    val rowsPerStrip = scalar(278, h.toLong).toInt
    if (rowsPerStrip <= 0) return None
    val offsets = values(273)
    val counts = values(279)
    if (offsets.isEmpty || offsets.length != counts.length) return None
    if (scalar(284, 1L) != 1L) return None // chunky planar only
    val predictor = scalar(317, 1L).toInt
    if (predictor != 1 && predictor != 2) return None
    val rowBytes = w * spp
    val data = new Array[Byte](rowBytes * h)
    var row = 0
    var s = 0
    while (s < offsets.length && row < h) {
      val off = offsets(s).toInt
      val len = counts(s).toInt
      if (off < 0 || len < 0 || off + len > payload.length) bad("strip bounds")
      val stripRows = math.min(rowsPerStrip, h - row)
      val want = rowBytes * stripRows
      val raw = compression match {
        case 1 =>
          if (len < want) bad("short uncompressed strip")
          java.util.Arrays.copyOfRange(payload, off, off + want)
        case 5 => lzwDecode(payload, off, len, want)
        case 32773 => packBitsDecode(payload, off, len, want)
        case _ => bad(s"compression $compression")
      }
      if (predictor == 2) { // horizontal differencing, per sample
        var r = 0
        while (r < stripRows) {
          var x = spp
          while (x < rowBytes) {
            raw(r * rowBytes + x) =
              (raw(r * rowBytes + x) + raw(r * rowBytes + x - spp)).toByte
            x += 1
          }
          r += 1
        }
      }
      System.arraycopy(raw, 0, data, row * rowBytes, want)
      row += stripRows
      s += 1
    }
    if (row < h) bad("missing strips")
    // assemble RGB24 by photometric interpretation
    val rgb = new Array[Byte](w * h * 3)
    photometric match {
      case 2 if spp == 3 => System.arraycopy(data, 0, rgb, 0, w * h * 3)
      case 0 | 1 if spp == 1 => // gray (0 = white-is-zero inverts)
        var p = 0
        while (p < w * h) {
          val g0 = data(p) & 0xFF
          val g = if (photometric == 0) 255 - g0 else g0
          rgb(p * 3) = g.toByte; rgb(p * 3 + 1) = g.toByte; rgb(p * 3 + 2) = g.toByte
          p += 1
        }
      case 3 if spp == 1 => // palette: ColorMap is 3 planes of 16-bit values
        val cm = values(320)
        if (cm.length < 3 * 256) bad(s"color map ${cm.length}")
        val third = cm.length / 3
        var p = 0
        while (p < w * h) {
          val idx = data(p) & 0xFF
          if (idx >= third) bad(s"palette index $idx")
          rgb(p * 3) = (cm(idx) >> 8).toByte
          rgb(p * 3 + 1) = (cm(third + idx) >> 8).toByte
          rgb(p * 3 + 2) = (cm(2 * third + idx) >> 8).toByte
          p += 1
        }
      case _ => bad(s"photometric $photometric spp $spp")
    }
    Some((w, h, rgb))
  } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * SINGLE-BAND RASTER decode — the WorldPop/GHSL shape: one sample per
   * pixel, either 8-bit unsigned or IEEE Float32 (SampleFormat tag 339 = 3,
   * the GeoTIFF population-raster encoding), uncompressed or PackBits/LZW.
   * Returns pixel values row-major as floats; None on anything else.
   */
  def decodeRaster(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = try {
    if (payload == null || payload.length < 8) return None
    if (!((payload(0) == 'I' && payload(1) == 'I') ||
        (payload(0) == 'M' && payload(1) == 'M'))) return None
    val ifd = new Ifd(payload)
    import ifd.{scalar, values}
    val w = scalar(256).toInt
    val h = scalar(257).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    if (scalar(277, 1L) != 1L) return None // single band
    val bps = scalar(258, 8L).toInt
    val sampleFormat = scalar(339, 1L).toInt
    val float32 = bps == 32 && sampleFormat == 3
    if (!float32 && !(bps == 8 && sampleFormat == 1)) return None
    val compression = scalar(259, 1L).toInt
    val rowsPerStrip = scalar(278, h.toLong).toInt
    if (rowsPerStrip <= 0) return None
    val offsets = values(273)
    val counts = values(279)
    if (offsets.isEmpty || offsets.length != counts.length) return None
    if (scalar(317, 1L) != 1L) return None // no predictor on rasters here
    val bytesPerPx = bps / 8
    val rowBytes = w * bytesPerPx
    val data = new Array[Byte](rowBytes * h)
    var row = 0
    var s = 0
    while (s < offsets.length && row < h) {
      val off = offsets(s).toInt
      val len = counts(s).toInt
      if (off < 0 || len < 0 || off + len > payload.length) bad("strip bounds")
      val stripRows = math.min(rowsPerStrip, h - row)
      val want = rowBytes * stripRows
      val raw = compression match {
        case 1 =>
          if (len < want) bad("short uncompressed strip")
          java.util.Arrays.copyOfRange(payload, off, off + want)
        case 5 => lzwDecode(payload, off, len, want)
        case 32773 => packBitsDecode(payload, off, len, want)
        case _ => bad(s"compression $compression")
      }
      System.arraycopy(raw, 0, data, row * rowBytes, want)
      row += stripRows
      s += 1
    }
    if (row < h) bad("missing strips")
    val out = new Array[Float](w * h)
    var p = 0
    while (p < w * h) {
      out(p) =
        if (!float32) (data(p) & 0xFF).toFloat
        else {
          val o = p * 4
          val bits =
            if (ifd.le) (data(o) & 0xFF) | ((data(o + 1) & 0xFF) << 8) |
              ((data(o + 2) & 0xFF) << 16) | ((data(o + 3) & 0xFF) << 24)
            else ((data(o) & 0xFF) << 24) | ((data(o + 1) & 0xFF) << 16) |
              ((data(o + 2) & 0xFF) << 8) | (data(o + 3) & 0xFF)
          java.lang.Float.intBitsToFloat(bits)
        }
      p += 1
    }
    Some((w, h, out))
  } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * GeoTIFF georeference of a north-up raster: ModelTiepointTag (33922,
   * pixel (0,0) ↔ world (lon, lat)) + ModelPixelScaleTag (33550) — the
   * affine every WorldPop/GHSL tile ships. Returns
   * (originLon, originLat, pixelWidthDeg, pixelHeightDeg); pixel (x, y)'s
   * CENTER is (originLon + (x+0.5)·pw, originLat − (y+0.5)·ph).
   */
  def geoReference(payload: Array[Byte]): Option[(Double, Double, Double, Double)] = try {
    if (payload == null || payload.length < 8) return None
    if (!((payload(0) == 'I' && payload(1) == 'I') ||
        (payload(0) == 'M' && payload(1) == 'M'))) return None
    val ifd = new Ifd(payload)
    val tie = ifd.doubles(33922)
    val scale = ifd.doubles(33550)
    if (tie.length < 6 || scale.length < 2) return None
    // tiepoint: (i, j, k, lon, lat, z) with (i, j) the RASTER point tied
    // to world (lon, lat); the shipped tiles tie pixel (0, 0)
    if (tie(0) != 0.0 || tie(1) != 0.0) return None
    if (!(scale(0) > 0 && scale(1) > 0)) return None
    Some((tie(3), tie(4), scale(0), scale(1)))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** PackBits (TIFF 6.0 §9): n>=0 copy n+1 literals; -127<=n<0 repeat next
    * byte 1-n times; -128 is a no-op. */
  private def packBitsDecode(data: Array[Byte], off: Int, len: Int,
                             want: Int): Array[Byte] = {
    val out = new Array[Byte](want)
    var i = off
    val end = off + len
    var o = 0
    while (o < want) {
      if (i >= end) bad("packbits truncated")
      val c = data(i); i += 1
      if (c >= 0) {
        val cnt = c + 1
        if (i + cnt > end || o + cnt > want) bad("packbits literal overrun")
        System.arraycopy(data, i, out, o, cnt)
        i += cnt; o += cnt
      } else if (c != -128) {
        val cnt = 1 - c
        if (i >= end || o + cnt > want) bad("packbits run overrun")
        java.util.Arrays.fill(out, o, o + cnt, data(i))
        i += 1; o += cnt
      }
    }
    out
  }

  /** TIFF LZW (6.0 §13): MSB-first code packing, initial width 9, Clear=256,
    * EOI=257, width bumps at table sizes 511/1023/2047 (the spec's
    * "early change"), max width 12. */
  private def lzwDecode(data: Array[Byte], off: Int, len: Int,
                        want: Int): Array[Byte] = {
    val out = new Array[Byte](want)
    var o = 0
    var bitPos = 0
    val totalBits = len * 8
    def read(width: Int): Int = {
      if (bitPos + width > totalBits) bad("lzw truncated")
      var v = 0
      var k = 0
      while (k < width) {
        val b = bitPos + k
        v = (v << 1) | ((data(off + (b >> 3)) >> (7 - (b & 7))) & 1)
        k += 1
      }
      bitPos += width
      v
    }
    val dict = new Array[Array[Byte]](4096)
    var size = 258
    var width = 9
    var prev: Array[Byte] = null
    def reset(): Unit = { size = 258; width = 9; prev = null }
    reset()
    while (o < want) {
      val code = read(width)
      if (code == 256) reset()
      else if (code == 257) { if (o != want) bad("lzw early EOI"); return out }
      else {
        val entry: Array[Byte] =
          if (code < 256) Array(code.toByte)
          else if (code < size && dict(code) != null) dict(code)
          else if (code == size && prev != null) prev :+ prev(0)
          else bad(s"lzw code $code size $size")
        if (o + entry.length > want) bad("lzw output overrun")
        System.arraycopy(entry, 0, out, o, entry.length)
        o += entry.length
        if (prev != null && size < 4096) { dict(size) = prev :+ entry(0); size += 1 }
        prev = entry
        // TIFF early change, decoder side: the encoder's table runs ONE
        // entry ahead (it adds on emit, we add on the NEXT read), so the
        // width bumps at 510/1022/2046 here vs 511/1023/2047 there —
        // off-by-one in either table desynchronizes every later code
        if (size == 510) width = 10
        else if (size == 1022) width = 11
        else if (size == 2046) width = 12
      }
    }
    out
  }

  /** Test seam: encode → decode through the LZW kernel pair (the gate
    * fixtures are too small to cross the 9→10 bit width bump; TiffSpec
    * drives a buffer past 2046 entries through this). */
  private[llm] def lzwRoundTripForTest(raw: Array[Byte]): Array[Byte] = {
    val enc = lzwEncode(raw)
    lzwDecode(enc, 0, enc.length, raw.length)
  }

  // ------------------------------------------------------------------
  // synthetic encoder (closed-form fixtures for the m29 gate + specs)
  // ------------------------------------------------------------------

  private def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var nb = 0
    def put(code: Int, width: Int): Unit = {
      cur = (cur << width) | code
      nb += width
      while (nb >= 8) { bits.write(((cur >> (nb - 8)) & 0xFF).toInt); nb -= 8 }
    }
    var width = 9
    var size = 258
    val table = new java.util.HashMap[String, Integer]()
    def key(b: Array[Byte], n: Int): String = {
      val sb = new java.lang.StringBuilder(n)
      var i = 0
      while (i < n) { sb.append((b(i) & 0xFF).toChar); i += 1 }
      sb.toString
    }
    put(256, width) // spec: streams begin with Clear
    var i = 0
    val buf = new Array[Byte](4096)
    var bl = 0
    while (i < raw.length) {
      buf(bl) = raw(i); bl += 1
      val k = key(buf, bl)
      if (bl == 1 || table.containsKey(k)) {
        // extend the current run (single bytes are implicit codes)
      } else {
        val prefixCode =
          if (bl == 2) buf(0) & 0xFF
          else table.get(key(buf, bl - 1)).intValue()
        put(prefixCode, width)
        if (size < 4096) { table.put(k, size); size += 1 }
        // early change mirrors the decoder
        if (size == 511) width = 10
        else if (size == 1023) width = 11
        else if (size == 2047) width = 12
        buf(0) = raw(i); bl = 1
      }
      i += 1
    }
    val lastCode =
      if (bl == 1) buf(0) & 0xFF else table.get(key(buf, bl)).intValue()
    put(lastCode, width)
    put(257, width) // EOI
    if (nb > 0) { bits.write(((cur << (8 - nb)) & 0xFF).toInt); nb = 0 }
    bits.toByteArray
  }

  private def packBitsEncode(raw: Array[Byte]): Array[Byte] = {
    // simple literal/run splitter: runs of >=3 identical bytes become runs
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < raw.length) {
      var run = 1
      while (i + run < raw.length && raw(i + run) == raw(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(1 - run); out.write(raw(i)); i += run
      } else {
        var lit = 0
        val start = i
        while (i + lit < raw.length && lit < 128 &&
            !(i + lit + 2 < raw.length && raw(i + lit) == raw(i + lit + 1) &&
              raw(i + lit) == raw(i + lit + 2))) lit += 1
        out.write(lit - 1)
        out.write(raw, start, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /**
   * Deterministic single-band Float32 GeoTIFF for a key — the
   * WorldPop-raster shape: little-endian, uncompressed, one strip,
   * SampleFormat 3, ModelTiepoint tying pixel (0,0) to a closed-form
   * origin and ModelPixelScale of exactly 1/32° (dyadic, so every pixel
   * CENTER is a dyadic rational both engines compute bit-identically).
   * Dims 16 × 10; value(x, y) = (id·7 + y·11 + x·13) % 256 as float;
   * origin lon = −72 + (id%5)·(1/2), lat = 11 − (id%3)·(1/2).
   */
  def syntheticGeoTiff(id: Long): Array[Byte] = {
    val w = 16; val h = 10
    val out = new java.io.ByteArrayOutputStream()
    def w16(x: Int): Unit = { out.write(x & 0xFF); out.write((x >> 8) & 0xFF) }
    def w32(x: Long): Unit = { out.write((x & 0xFF).toInt); out.write(((x >> 8) & 0xFF).toInt)
      out.write(((x >> 16) & 0xFF).toInt); out.write(((x >> 24) & 0xFF).toInt) }
    def w64d(d: Double): Unit = {
      val b = java.lang.Double.doubleToLongBits(d)
      (0 until 8).foreach(k => out.write(((b >> (8 * k)) & 0xFF).toInt))
    }
    val nEntries = 12
    val ifdOff = 8
    val afterIfd = ifdOff + 2 + nEntries * 12 + 4
    val tieOff = afterIfd            // 6 doubles
    val scaleOff = tieOff + 48       // 3 doubles
    val stripOff = scaleOff + 24
    out.write('I'); out.write('I'); w16(42); w32(ifdOff)
    w16(nEntries)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value.toInt); w16(0) } else w32(value)
    }
    entry(256, 3, 1, w)
    entry(257, 3, 1, h)
    entry(258, 3, 1, 32)
    entry(259, 3, 1, 1)            // uncompressed
    entry(262, 3, 1, 1)            // black-is-zero
    entry(273, 4, 1, stripOff)
    entry(277, 3, 1, 1)
    entry(278, 3, 1, h)
    entry(279, 4, 1, w * h * 4)
    entry(339, 3, 1, 3)            // SampleFormat: IEEE float
    entry(33550, 12, 3, scaleOff)  // ModelPixelScale
    entry(33922, 12, 6, tieOff)    // ModelTiepoint
    w32(0)
    val lon0 = -72.0 + (id % 5) * 0.5
    val lat0 = 11.0 - (id % 3) * 0.5
    // tiepoint (0,0,0) -> (lon0, lat0, 0)
    Seq(0.0, 0.0, 0.0, lon0, lat0, 0.0).foreach(w64d)
    Seq(0.03125, 0.03125, 0.0).foreach(w64d)
    for (y <- 0 until h; x <- 0 until w) {
      val bits = java.lang.Float.floatToIntBits(
        ((id * 7 + y * 11 + x * 13) % 256).toFloat)
      w32(bits.toLong & 0xFFFFFFFFL)
    }
    out.toByteArray
  }

  /**
   * Deterministic TIFF for a key — four REAL encodings by `id % 4`, both
   * byte orders, all decoding to closed-form pixels (dims 8+id%9 × 5+id%5):
   *
   *  - t0 uncompressed RGB, little-endian;
   *    pixels (id·7+y·11+x·13, +17, +34) % 256
   *  - t1 PackBits GRAYSCALE, big-endian; gray = (id·7 + y·3 + x/4) % 256
   *    (x/4 plateaus make real runs, so both PackBits branches execute)
   *  - t2 LZW + horizontal-predictor RGB, little-endian; t0's pixels
   *  - t3 PALETTE-color (16-bit ColorMap), big-endian; index
   *    (id+x+2y) % 4, palette c → (id·5+c·31, id·3+c·47, id·11+c·61) % 256
   */
  def syntheticTiff(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (5 + id % 5).toInt
    val v = (id % 4).toInt
    val le = v == 0 || v == 2
    val out = new java.io.ByteArrayOutputStream()
    def w16(x: Int): Unit =
      if (le) { out.write(x & 0xFF); out.write((x >> 8) & 0xFF) }
      else { out.write((x >> 8) & 0xFF); out.write(x & 0xFF) }
    def w32(x: Long): Unit =
      if (le) { out.write((x & 0xFF).toInt); out.write(((x >> 8) & 0xFF).toInt)
        out.write(((x >> 16) & 0xFF).toInt); out.write(((x >> 24) & 0xFF).toInt) }
      else { out.write(((x >> 24) & 0xFF).toInt); out.write(((x >> 16) & 0xFF).toInt)
        out.write(((x >> 8) & 0xFF).toInt); out.write((x & 0xFF).toInt) }

    val spp = if (v == 0 || v == 2) 3 else 1
    val raw = new Array[Byte](w * h * spp)
    for (y <- 0 until h; x <- 0 until w) {
      if (spp == 3) {
        raw((y * w + x) * 3) = ((id * 7 + y * 11 + x * 13) % 256).toByte
        raw((y * w + x) * 3 + 1) = ((id * 7 + y * 11 + x * 13 + 17) % 256).toByte
        raw((y * w + x) * 3 + 2) = ((id * 7 + y * 11 + x * 13 + 34) % 256).toByte
      } else if (v == 1) {
        raw(y * w + x) = ((id * 7 + y * 3 + x / 4) % 256).toByte
      } else {
        raw(y * w + x) = ((id + x + 2L * y) % 4).toByte
      }
    }
    val strip: Array[Byte] = v match {
      case 0 | 3 => raw
      case 1 => packBitsEncode(raw)
      case _ =>
        val diffed = raw.clone()
        var y = 0
        while (y < h) {
          var x = w * spp - 1
          while (x >= spp) {
            diffed(y * w * spp + x) =
              (diffed(y * w * spp + x) - diffed(y * w * spp + x - spp)).toByte
            x -= 1
          }
          y += 1
        }
        lzwEncode(diffed)
    }
    val compression = v match { case 1 => 32773; case 2 => 5; case _ => 1 }
    val photometric = v match { case 0 | 2 => 2; case 1 => 1; case _ => 3 }

    // layout: header(8) IFD [entries...] next(4) | bits-array | colormap | strip
    // 9 base tags (256/257/258/259/262/273/277/278/279) + predictor (v2)
    // or colormap (v3); the BitsPerSample ARRAY adds bytes, not an entry
    val nEntries = 9 + (if (v == 2) 1 else 0) + (if (v == 3) 1 else 0)
    val ifdOff = 8
    val afterIfd = ifdOff + 2 + nEntries * 12 + 4
    val bitsOff = afterIfd // SHORT[spp] when spp == 3 (6 bytes)
    val cmOff = bitsOff + (if (spp == 3) 6 else 0)
    val stripOff = cmOff + (if (v == 3) 3 * 256 * 2 else 0)

    // header
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    w16(42); w32(ifdOff)
    w16(nEntries)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(tag); w16(typ); w32(count)
      // inline values pack into the FIRST bytes of the 4-byte field
      if (typ == 3 && count == 1) { w16(value.toInt); w16(0) }
      else w32(value)
    }
    entry(256, 3, 1, w)                      // ImageWidth
    entry(257, 3, 1, h)                      // ImageLength
    if (spp == 3) entry(258, 3, 3, bitsOff)  // BitsPerSample -> offset
    else entry(258, 3, 1, 8)
    entry(259, 3, 1, compression)
    entry(262, 3, 1, photometric)
    entry(273, 4, 1, stripOff)               // StripOffsets
    entry(277, 3, 1, spp)
    entry(278, 3, 1, h)                      // RowsPerStrip: one strip
    entry(279, 4, 1, strip.length)           // StripByteCounts
    if (v == 2) entry(317, 3, 1, 2)          // Predictor: horizontal
    if (v == 3) entry(320, 3, 3 * 256, cmOff) // ColorMap
    w32(0) // next IFD
    if (spp == 3) { w16(8); w16(8); w16(8) }
    if (v == 3) {
      // 16-bit planes R,G,B; entry c = closed-form palette << 8
      def plane(f: Int => Int): Unit =
        (0 until 256).foreach(c => w16(if (c < 4) f(c) << 8 else 0))
      plane(c => ((id * 5 + c * 31) % 256).toInt)
      plane(c => ((id * 3 + c * 47) % 256).toInt)
      plane(c => ((id * 11 + c * 61) % 256).toInt)
    }
    out.write(strip)
    out.toByteArray
  }
}
