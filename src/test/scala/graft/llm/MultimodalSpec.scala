package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(
    Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("k"), "k")

  test("synthetic media: typed metadata struct, deterministic payloads") {
    val rows = media.collect()
    assert(rows.length == 6)
    val types = media.select("meta.media_type").as[String].collect().toSet
    assert(types == Set("image", "audio", "video"))
    // videos carry a duration; images/audio don't
    assert(media.filter($"meta.media_type" === "video" && $"meta.duration_ms".isNull).count() == 0)
    assert(media.filter($"meta.media_type" =!= "video" && $"meta.duration_ms".isNotNull).count() == 0)
  }

  test("extractFeatures: fixed-dim vectors, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(media, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f1.values.forall(_.length == 8))
    assert(f1 == f2)
    assert(f1(0L) != f1(1L)) // payloads differ -> features differ
  }

  test("decodePpm: hand-written P6 literal decodes to the exact pixels") {
    val raster = Array[Byte](
      10, 20, 30, 40, 50, 60,
      70, 80, 90, 100, 110, 120)
    val bytes = "P6\n# a header comment\n2 2\n255\n".getBytes("US-ASCII") ++ raster
    val (w, h, px) = Multimodal.decodePpm(bytes).get
    assert(w == 2 && h == 2)
    assert(px.toSeq == raster.toSeq)
    // malformed payloads are rejected, not mis-decoded
    assert(Multimodal.decodePpm("P5\n2 2\n255\n".getBytes("US-ASCII") ++ raster).isEmpty,
      "P5 (grayscale) magic must not decode as P6")
    assert(Multimodal.decodePpm("P6\n2 2\n255\n".getBytes("US-ASCII") ++ raster.take(5)).isEmpty,
      "truncated raster must be rejected")
    assert(Multimodal.decodePpm("P6\n2 2\n65535\n".getBytes("US-ASCII") ++ raster).isEmpty,
      "16-bit maxval must be rejected")
    assert(Multimodal.decodePpm(null).isEmpty)
  }

  test("decodePng: round-trips syntheticPng through every filter type and both color types") {
    // heights >= 5 guarantee rows filtered with all five types (y % 5);
    // even ids are RGB (type 2), odd RGBA (type 6, alpha dropped)
    for (id <- 0L to 10L) {
      val (w, h, rgb) = Multimodal.decodePng(Multimodal.syntheticPng(id)).get
      assert(w == 8 + id % 9 && h == 5 + id % 6, s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert((rgb((y * w + x) * 3 + c) & 0xFF) ==
          ((id * 7 + y * 11 + x * 13 + c * 17) % 256).toInt,
          s"id=$id pixel ($x,$y) channel $c (row filter ${y % 5})")
    }
  }

  test("decodePng: grayscale expands to RGB; corrupt payloads are rejected") {
    // hand-build a 2x2 8-bit grayscale (color type 0) PNG: filter 0 rows
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = t.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      val len = data.length
      Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte) ++
        tb ++ data ++ {
          val v = crc.getValue.toInt
          Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
        }
    }
    val raw = Array[Byte](0, 10, 20, 0, 30, 40) // 2 rows: filter byte + 2 gray px
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val z = new Array[Byte](64)
    val zn = defl.deflate(z); defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(2).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n')
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", z.take(zn)) ++
      chunk("IEND", Array.emptyByteArray)
    val (w, h, rgb) = Multimodal.decodePng(png).get
    assert(w == 2 && h == 2)
    assert(rgb.toSeq == Seq[Byte](10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40))
    // corrupt one IDAT byte -> CRC mismatch -> rejected, not mis-decoded
    val bad = png.clone()
    bad(sig.length + chunk("IHDR", ihdr).length + 9) =
      (bad(sig.length + chunk("IHDR", ihdr).length + 9) ^ 0x55).toByte
    assert(Multimodal.decodePng(bad).isEmpty, "corrupt IDAT must fail the CRC")
    assert(Multimodal.decodePng(png.dropRight(20)).isEmpty, "truncated stream rejected")
    assert(Multimodal.decodePng(null).isEmpty)
    // PPM magic is not PNG
    assert(Multimodal.decodePng(Multimodal.syntheticPpm(0L)).isEmpty)
    // and decodeImage routes each format to its decoder
    assert(Multimodal.decodeImage(Multimodal.syntheticPng(3L)).isDefined)
    assert(Multimodal.decodeImage(Multimodal.syntheticPpm(3L)).isDefined)
  }

  test("decodePng: Adam7 interlaced streams decode to the identical raster") {
    for (id <- 0L to 10L) { // both color types, every dims combination
      val (pw, ph, prgb) = Multimodal.decodePng(Multimodal.syntheticPng(id)).get
      val (iw, ih, irgb) =
        Multimodal.decodePng(Multimodal.syntheticPng(id, interlaced = true)).get
      assert(iw == pw && ih == ph && java.util.Arrays.equals(irgb, prgb),
        s"id=$id: interlaced decode diverged")
    }
    // the smallest synthetic (8×5) exercises single-row and zero-row
    // passes (yStart 4 at step 8 → one row; higher starts → empty), so
    // the empty-pass skip is covered by the loop above
  }

  test("decodePng: palette (type 3) round-trips through PLTE lookup; missing PLTE rejected") {
    for (id <- 0L to 10L) {
      val (w, h, rgb) = Multimodal.decodePng(Multimodal.syntheticPngPalette(id)).get
      assert(w == 8 + (id % 9) && h == 5 + (id % 6), s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val idx = ((id * 7 + y * 11 + x * 13) % 256).toInt
        val d = (y * w + x) * 3
        assert((rgb(d) & 0xFF) == ((idx * 3 + id) % 256).toInt &&
          (rgb(d + 1) & 0xFF) == ((idx * 5 + 2 * id) % 256).toInt &&
          (rgb(d + 2) & 0xFF) == ((idx * 7 + 3 * id) % 256).toInt,
          s"id=$id px ($x,$y)")
      }
    }
    // a type-3 stream whose PLTE chunk is stripped must reject
    val good = Multimodal.syntheticPngPalette(4L)
    val noPlte = new java.io.ByteArrayOutputStream()
    var o = 8
    noPlte.write(good, 0, 8)
    while (o + 12 <= good.length) {
      val len = ((good(o) & 0xFF) << 24) | ((good(o + 1) & 0xFF) << 16) |
        ((good(o + 2) & 0xFF) << 8) | (good(o + 3) & 0xFF)
      val ctype = new String(good, o + 4, 4, "US-ASCII")
      if (ctype != "PLTE") noPlte.write(good, o, 12 + len)
      o += 12 + len
    }
    assert(Multimodal.decodePng(noPlte.toByteArray).isEmpty, "PLTE-less type 3 rejected")
    assert(Multimodal.decodeImage(good).isDefined)
  }

  test("decodeGif: LZW round-trip incl. the code-width escalation; malformed rejected") {
    for (id <- 0L to 12L) {
      val (w, h, rgb) = Multimodal.decodeGif(Multimodal.syntheticGif(id)).get
      assert(w == 24 + (id % 9) * 2 && h == 20 + (id % 7) * 2, s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val idx = ((id * 7 + y * 11 + x * 13) % 256).toInt
        val d = (y * w + x) * 3
        assert((rgb(d) & 0xFF) == ((idx * 3 + id) % 256).toInt &&
          (rgb(d + 1) & 0xFF) == ((idx * 5 + 2 * id) % 256).toInt &&
          (rgb(d + 2) & 0xFF) == ((idx * 7 + 3 * id) % 256).toInt,
          s"id=$id pixel ($x,$y)")
      }
    }
    // id=8 is the largest frame (40x20 = 800 px) — its LZW dictionary
    // provably crosses the 512-entry boundary, so the 9->10-bit width
    // escalation was exercised by the round-trip above
    assert(24 + (8 % 9) * 2 == 40)
    // interlaced streams de-interlace to the identical raster
    for (id <- 0L to 8L) {
      val (pw, ph, prgb) = Multimodal.decodeGif(Multimodal.syntheticGif(id)).get
      val (iw2, ih2, irgb) =
        Multimodal.decodeGif(Multimodal.syntheticGif(id, interlaced = true)).get
      assert(iw2 == pw && ih2 == ph && java.util.Arrays.equals(irgb, prgb),
        s"id=$id: interlaced decode diverged")
    }
    // malformed payloads are rejected, not mis-decoded
    val good = Multimodal.syntheticGif(3L)
    assert(Multimodal.decodeGif(good.dropRight(30)).isEmpty, "truncated rejected")
    assert(Multimodal.decodeGif("GIF00a".getBytes("US-ASCII") ++ good.drop(6)).isEmpty)
    assert(Multimodal.decodeGif(null).isEmpty)
    assert(Multimodal.decodeGif(Multimodal.syntheticPng(3L)).isEmpty)
    // decodeImage routes GIF through the shared image contract
    assert(Multimodal.decodeImage(good).isDefined)
  }

  test("decodeBmp: both raster orders, BGR→RGB, row padding; malformed rejected") {
    for (id <- 0L to 11L) { // covers every (w, h, topDown) combination once
      val (w, h, rgb) = Multimodal.decodeBmp(Multimodal.syntheticBmp(id)).get
      assert(w == 5 + (id % 8) && h == 4 + (id % 6), s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val want = ((id * 7 + y * 11 + x * 13 + c * 17) % 256).toInt
        assert((rgb((y * w + x) * 3 + c) & 0xFF) == want, s"id=$id px ($x,$y,$c)")
      }
    }
    val good = Multimodal.syntheticBmp(2L) // bottom-up; 3L is top-down
    assert(Multimodal.decodeBmp(Multimodal.syntheticBmp(3L)).isDefined)
    assert(Multimodal.decodeBmp(good.dropRight(8)).isEmpty, "truncated rejected")
    assert(Multimodal.decodeBmp(null).isEmpty)
    assert(Multimodal.decodeBmp(Multimodal.syntheticPng(3L)).isEmpty)
    // a 32-bpp claim over the same bytes must be rejected, not mis-strided
    val bad32 = good.clone(); bad32(28) = 32.toByte
    assert(Multimodal.decodeBmp(bad32).isEmpty, "non-24-bpp rejected")
    val badComp = good.clone(); badComp(30) = 1.toByte // BI_RLE8
    assert(Multimodal.decodeBmp(badComp).isEmpty, "compressed rejected")
    // decodeImage routes BMP through the shared image contract
    assert(Multimodal.decodeImage(good).isDefined)
  }

  test("decodeJpeg: full entropy round-trip, grayscale + 4:4:4 color; malformed rejected") {
    for (id <- 0L to 11L) { // covers every (wb, hb, nc) combination
      val (w, h, rgb) = Multimodal.decodeJpeg(Multimodal.syntheticJpeg(id)).get
      assert(w == (2 + id % 3) * 8 && h == (2 + id % 2) * 8, s"id=$id dims")
      def c(bx: Long, by: Long, comp: Long): Int =
        128 + 2 * (((id * 7 + bx * 11 + by * 13 + comp * 17) % 61).toInt - 30)
      for (y <- 0 until h; x <- 0 until w) {
        val bx = x / 8; val by = y / 8
        val d = (y * w + x) * 3
        val (er, eg, eb) =
          if (id % 2 == 0) { val g = c(bx, by, 0); (g, g, g) }
          else {
            val yv = c(bx, by, 0).toDouble
            val cb = c(bx, by, 1) - 128.0
            val cr = c(bx, by, 2) - 128.0
            def cl(v: Double) = math.min(255, math.max(0, Math.round(v).toInt))
            (cl(yv + 1.402 * cr),
             cl(yv - 0.344136 * cb - 0.714136 * cr),
             cl(yv + 1.772 * cb))
          }
        assert((rgb(d) & 0xFF) == er && (rgb(d + 1) & 0xFF) == eg &&
          (rgb(d + 2) & 0xFF) == eb, s"id=$id px ($x,$y)")
      }
    }
    val good = Multimodal.syntheticJpeg(3L)
    assert(Multimodal.decodeJpeg(good.dropRight(6)).isEmpty, "truncated rejected")
    assert(Multimodal.decodeJpeg(null).isEmpty)
    assert(Multimodal.decodeJpeg(Multimodal.syntheticPng(3L)).isEmpty)
    // a progressive SOF marker over the same stream must be rejected
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(Multimodal.decodeJpeg(prog).isEmpty, "progressive rejected")
    // decodeImage routes JPEG through the shared image contract
    assert(Multimodal.decodeImage(good).isDefined)
  }

  test("decodeJpeg: DRI/RSTn restart intervals decode identically; missing RST rejected") {
    for (id <- 0L to 5L; every <- Seq(1, 2, 3)) {
      val (pw, ph, prgb) = Multimodal.decodeJpeg(Multimodal.syntheticJpeg(id)).get
      val (rw, rh, rrgb) =
        Multimodal.decodeJpeg(Multimodal.syntheticJpeg(id, restartEvery = every)).get
      assert(rw == pw && rh == ph && java.util.Arrays.equals(rrgb, prgb),
        s"id=$id every=$every: restart decode diverged")
    }
    // DRI declared but the RST markers stripped → the aligned read must
    // reject, not silently misparse the next MCU's bits
    val withRst = Multimodal.syntheticJpeg(4L, restartEvery = 1)
    val stripped = new scala.collection.mutable.ArrayBuffer[Byte]()
    var i = 0
    var inEntropy = false
    while (i < withRst.length) {
      val isRst = i + 1 < withRst.length && (withRst(i) & 0xFF) == 0xFF &&
        (withRst(i + 1) & 0xF8) == 0xD0 && (withRst(i + 1) & 0xFF) != 0xD8
      if (inEntropy && isRst) i += 2
      else {
        if ((withRst(i) & 0xFF) == 0xFF && i + 1 < withRst.length &&
            (withRst(i + 1) & 0xFF) == 0xDA) inEntropy = true
        stripped += withRst(i); i += 1
      }
    }
    assert(Multimodal.decodeJpeg(stripped.toArray).isEmpty, "missing RST must reject")
  }

  test("decodeJpeg: non-multiple-of-8 dims crop the padded block grid") {
    // patch a 16×16 grayscale stream's SOF dims to 13×11: the MCU count
    // is unchanged (ceil/8 → 2×2), so the same entropy data decodes and
    // the assembly must CROP the padded plane, not scale or reject
    val src = Multimodal.syntheticJpeg(0L) // 16×16, grayscale
    val (fw, fh, full) = Multimodal.decodeJpeg(src).get
    assert(fw == 16 && fh == 16)
    val patched = src.clone()
    val sofAt = (0 until patched.length - 1).find(i =>
      (patched(i) & 0xFF) == 0xFF && (patched(i + 1) & 0xFF) == 0xC0).get
    patched(sofAt + 5) = 0; patched(sofAt + 6) = 11 // height 11
    patched(sofAt + 7) = 0; patched(sofAt + 8) = 13 // width 13
    val (cw, ch, crop) = Multimodal.decodeJpeg(patched).get
    assert(cw == 13 && ch == 11)
    for (y <- 0 until 11; x <- 0 until 13; c <- 0 until 3)
      assert(crop((y * 13 + x) * 3 + c) == full((y * 16 + x) * 3 + c),
        s"crop px ($x,$y,$c) diverged from the full raster")
  }

  test("decodeJpeg: progressive (SOF2) multi-scan decode equals the baseline raster") {
    for (id <- 0L to 11L) {
      val base = Multimodal.decodeJpeg(Multimodal.syntheticJpeg(id))
      val prog = Multimodal.decodeJpeg(Multimodal.syntheticJpegProgressive(id))
      assert(prog.isDefined, s"id=$id: progressive decode failed")
      val (pw, ph, prgb) = base.get
      val (qw, qh, qrgb) = prog.get
      assert(qw == pw && qh == ph && java.util.Arrays.equals(qrgb, prgb),
        s"id=$id: progressive decode diverged from baseline")
    }
  }

  test("decodeJpeg 4:2:0: MCU block order + chroma upsampling round-trip") {
    for (id <- 0L to 5L) { // every (mx, my) combination
      val (w, h, rgb) = Multimodal.decodeJpeg(Multimodal.syntheticJpeg420(id)).get
      assert(w == (1 + id % 3) * 16 && h == (1 + id % 2) * 16, s"id=$id dims")
      def c(i: Long, j: Long, comp: Long): Int =
        128 + 2 * (((id * 7 + i * 11 + j * 13 + comp * 17) % 61).toInt - 30)
      def cl(v: Double) = math.min(255, math.max(0, Math.round(v).toInt))
      for (y <- 0 until h; x <- 0 until w) {
        val yv = c(x / 8, y / 8, 0).toDouble   // Y grid: per 8×8 block
        val cb = c(x / 16, y / 16, 1) - 128.0  // chroma grid: per MCU
        val cr = c(x / 16, y / 16, 2) - 128.0
        val d = (y * w + x) * 3
        assert((rgb(d) & 0xFF) == cl(yv + 1.402 * cr) &&
          (rgb(d + 1) & 0xFF) == cl(yv - 0.344136 * cb - 0.714136 * cr) &&
          (rgb(d + 2) & 0xFF) == cl(yv + 1.772 * cb), s"id=$id px ($x,$y)")
      }
    }
    // a 3×1 sampling factor must reject (only 1 and 2 supported)
    val bad = Multimodal.syntheticJpeg420(1L).clone()
    val sofAt = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xFF) == 0xFF && (bad(i + 1) & 0xFF) == 0xC0).get
    bad(sofAt + 2 + 9) = 0x31.toByte // Y component H=3, V=1
    assert(Multimodal.decodeJpeg(bad).isEmpty, "factor 3 rejected")
  }

  test("extractFeatures and resizeImages treat PNG rows as real images") {
    // a PNG row must produce pixelFeatures (not stub noise), equal to the
    // PPM-encoded features of the same raster
    val pngMedia = Seq(4L).toDF("k")
    val withPng = Multimodal.syntheticMedia(pngMedia, "k")
      .withColumn("payload", udf((id: Long) => Multimodal.syntheticPng(id)).apply($"media_id"))
    val feats = Multimodal.extractFeatures(withPng, dim = 8)
      .select("features").as[Seq[Float]].head()
    val (w, h, rgb) = Multimodal.decodePng(Multimodal.syntheticPng(4L)).get
    assert(feats == Multimodal.pixelFeatures(w, h, rgb, 8).toSeq)
    // resize decodes the PNG and re-encodes P6 at the capped dims
    val resized = Multimodal.resizeImages(withPng, maxDim = 4)
      .select("payload").as[Array[Byte]].head()
    val (rw, rh, _) = Multimodal.decodePpm(resized).get
    assert(math.max(rw, rh) == 4, s"resized to ${rw}x$rh")
  }

  test("extractFeatures decodes PPM image rows to real pixel features") {
    // ids 0 and 3 are images (real P6 payloads); their features must equal
    // a direct pixelFeatures computation over the decoded raster
    val feats = Multimodal.extractFeatures(media, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    for (id <- Seq(0L, 3L)) {
      val (w, h, rgb) = Multimodal.decodePpm(Multimodal.syntheticPpm(id)).get
      assert(feats(id) == Multimodal.pixelFeatures(w, h, rgb, 8).toSeq,
        s"image $id features must come from decoded pixels")
    }
    // and the first feature is the true red-channel mean, not stub noise
    val (w0, h0, rgb0) = Multimodal.decodePpm(Multimodal.syntheticPpm(0L)).get
    val meanR = rgb0.grouped(3).map(p => p(0) & 0xFF).sum / (w0 * h0).toFloat / 255f
    assert(math.abs(feats(0L)(0) - meanR) < 1e-6f)
  }

  test("resizeImages caps the max dimension, preserving aspect") {
    val resized = Multimodal.resizeImages(media, maxDim = 50)
    val dims = resized.select($"media_id", $"meta.width", $"meta.height")
      .as[(Long, Int, Int)].collect()
    dims.foreach { case (_, w, h) => assert(math.max(w, h) <= 50) }
  }

  test("resizeImages resamples real pixels: nearest-neighbour mapping, hand-checked") {
    import spark.implicits._
    // id=6 -> 5x5 source, resized to 4x4; expected pixel (x,y,c) =
    // formula at src (x*5/4, y*5/4) integer division
    val media = Multimodal.syntheticMedia(Seq(6L).toDF("k"), "k")
    val resized = Multimodal.resizeImages(media, maxDim = 4)
    val payload = resized.select("payload").as[Array[Byte]].head()
    val Some((w2, h2, rgb)) = Multimodal.decodePpm(payload)
    assert(w2 == 4 && h2 == 4)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
      val sx = x * 5 / 4; val sy = y * 5 / 4
      val expect = ((6L * 7 + sy * 11 + sx * 13 + c * 17) % 256).toInt
      assert((rgb((y * 4 + x) * 3 + c) & 0xFF) == expect,
        s"pixel ($x,$y,$c): got ${rgb((y * 4 + x) * 3 + c) & 0xFF}, want $expect")
    }
    // meta dims track the payload dims
    val dims = resized.select("meta.width", "meta.height").as[(Int, Int)].head()
    assert(dims == ((4, 4)))
    // already-small image passes through byte-identical
    val small = Multimodal.resizeImages(media, maxDim = 10)
      .select("payload").as[Array[Byte]].head()
    val orig = media.select("payload").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(small, orig))
  }

  test("decodeWav: synthetic round-trip, exact samples, malformed fallback") {
    // stereo clip (odd id): decode must recover every interleaved sample
    val id = 7L
    val Some((nc, rate, samples)) = Multimodal.decodeWav(Multimodal.syntheticWav(id))
    assert(nc == 2 && rate == 8000)
    val frames = (100 + id % 50).toInt
    assert(samples.length == frames * nc)
    for (i <- 0 until frames; ch <- 0 until nc) {
      val expect = ((id * 31 + i * 7 + ch * 13) % 4096 - 2048).toShort
      assert(samples(i * nc + ch) == expect,
        s"frame $i ch $ch: got ${samples(i * nc + ch)}, want $expect")
    }
    // mono clip decodes too
    val Some((nc1, _, s1)) = Multimodal.decodeWav(Multimodal.syntheticWav(4L))
    assert(nc1 == 1 && s1.length == 104)
    // non-WAV payloads (PPM, junk, truncated WAV) fall back to None
    assert(Multimodal.decodeWav(Multimodal.syntheticPpm(3L)).isEmpty)
    assert(Multimodal.decodeWav(Array.fill[Byte](64)(1)).isEmpty)
    assert(Multimodal.decodeWav(
      Multimodal.syntheticWav(id).take(50)).isEmpty)
  }

  test("decodeAiff: synthetic round-trip, exact samples, dispatch, malformed fallback") {
    // stereo clip (odd id): big-endian samples must round-trip exactly
    val id = 7L
    val Some((nc, rate, samples)) = Multimodal.decodeAiff(Multimodal.syntheticAiff(id))
    assert(nc == 2 && rate == 16000, "80-bit extended-float rate parse")
    val frames = (90 + id % 40).toInt
    assert(samples.length == frames * nc)
    for (i <- 0 until frames; ch <- 0 until nc) {
      val expect = ((id * 37 + i * 11 + ch * 17) % 4096 - 2048).toShort
      assert(samples(i * nc + ch) == expect,
        s"frame $i ch $ch: got ${samples(i * nc + ch)}, want $expect")
    }
    // mono clip
    val Some((nc1, r1, s1)) = Multimodal.decodeAiff(Multimodal.syntheticAiff(4L))
    assert(nc1 == 1 && r1 == 16000 && s1.length == 94)
    // SSND offset field: frames shifted by a 4-byte offset still decode
    val base = Multimodal.syntheticAiff(4L)
    val withOff = {
      val b = java.nio.ByteBuffer.allocate(base.length + 4)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.put(base, 0, 12) // FORM hdr (size fixed below)
      b.put(base, 12, 26) // COMM unchanged
      b.put("SSND".getBytes("US-ASCII")).putInt(8 + 4 + 94 * 2)
        .putInt(4).putInt(0).putInt(0xDEADBEEF) // offset 4 + filler
      b.put(base, 12 + 26 + 16, 94 * 2)
      val out = b.array()
      val newSz = out.length - 8
      out(4) = (newSz >> 24).toByte; out(5) = (newSz >> 16).toByte
      out(6) = (newSz >> 8).toByte; out(7) = newSz.toByte
      out
    }
    val Some((_, _, sOff)) = Multimodal.decodeAiff(withOff)
    assert(sOff.sameElements(s1), "SSND offset must skip the filler bytes")
    // dispatch: decodeAudio routes AIFF by FORM…AIFF magic, WAV/FLAC intact
    assert(Multimodal.decodeAudio(Multimodal.syntheticAiff(id)).get._2 == 16000)
    assert(Multimodal.decodeAudio(Multimodal.syntheticWav(id)).get._2 == 8000)
    // malformed: junk, truncated, non-AIFF FORM type
    assert(Multimodal.decodeAiff(Array.fill[Byte](64)(1)).isEmpty)
    assert(Multimodal.decodeAiff(Multimodal.syntheticAiff(id).take(40)).isEmpty)
    val notAiff = Multimodal.syntheticAiff(id).clone()
    notAiff(8) = 'X'.toByte
    assert(Multimodal.decodeAiff(notAiff).isEmpty)
  }

  test("decodeWav: G.711 µ-law/A-law expansion and float32 scaling, known values") {
    // hand-computed ITU G.711 reference points
    //   µ-law 0xFF → ~0xFF = 0x00 → t = (0<<3)+0x84 = 132, shift 0 → 132-132 = 0
    //   µ-law 0x7F → ~0x7F = 0x80 → sign set, t = 132 → 132-132... sign: 0x84-132 = 0
    //   µ-law 0x00 → ~0x00 = 0xFF → sign, e=7, t=(15·8+132)·128 = 32256 → 132-32256 = -32124
    //   A-law 0xD5 → ⊕0x55 = 0x80 → sign set, seg 0 → 0·16+8 = +8
    //   A-law 0x55 → ⊕0x55 = 0x00 → seg 0 → -(8) = -8
    //   A-law 0x2A → ⊕0x55 = 0x7F → seg 7, t = (15·16+264)·64 = 32256 → -32256
    def law(fmt: Int, bytes: Array[Int]): Array[Short] = {
      val buf = java.nio.ByteBuffer.allocate(44 + bytes.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(36 + bytes.length).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16).putShort(fmt.toShort).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
        .put("data".getBytes).putInt(bytes.length)
      bytes.foreach(b => buf.put(b.toByte))
      Multimodal.decodeWav(buf.array()).get._3
    }
    assert(law(7, Array(0xFF, 0x7F, 0x00)).toSeq == Seq[Short](0, 0, -32124))
    assert(law(6, Array(0xD5, 0x55, 0x2A)).toSeq == Seq[Short](8, -8, -32256))
    // float32: dyadic k/2^15 recovers k; out-of-range clamps
    for (id <- 0L to 5L) {
      val (nc, rate, samples) = Multimodal.decodeWav(Multimodal.syntheticWavExt(id)).get
      assert(nc == 1 && rate == 8000 && samples.length == 80 + id % 40)
      if (id % 3 == 2) {
        for (i <- samples.indices)
          assert(samples(i) == ((id * 31 + i * 7) % 4096 - 2048).toInt, s"id=$id i=$i")
      }
    }
    // unsupported format/bits combination rejects
    val bad = Multimodal.syntheticWavExt(0L).clone()
    bad(20) = 2 // format 2 (ADPCM) unsupported
    assert(Multimodal.decodeWav(bad).isEmpty)
  }

  test("audioStats: exact channel sums over the synthetic media table") {
    val stats = Multimodal.audioStats(media)
      .as[(Long, Int, Int, Int, Long, Long, Long)].collect()
    assert(stats.nonEmpty)
    stats.foreach { case (id, nc, rate, nf, dur, s0, sr) =>
      assert(id % 3 == 1, "only audio rows survive")
      assert(nc == (1 + id % 2).toInt && rate == 8000 && nf == (100 + id % 50).toInt)
      assert(dur == nf.toLong * 1000 / 8000)
      val e0 = (0 until nf).map(i => (id * 31 + i * 7) % 4096 - 2048).sum
      val er = (0 until nf).flatMap(i =>
        (1 until nc).map(ch => (id * 31 + i * 7 + ch * 13) % 4096 - 2048)).sum
      assert(s0 == e0 && sr == er, s"id=$id: ($s0,$sr) vs ($e0,$er)")
    }
  }

  test("audioFeatures: ZCR counts sign-class flips, abs-sum exact per channel") {
    val feats = Multimodal.audioFeatures(media.filter($"meta.media_type" === "audio"))
      .select($"media_id", $"channel", $"n_frames", $"zero_crossings", $"abs_sum")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(feats.nonEmpty)
    feats.foreach { case (id, c, nf, zcr, sabs) =>
      assert(nf == 100 + id % 50)
      val xs = (0 until nf.toInt).map(i => (id * 31 + i * 7 + c * 13) % 4096 - 2048)
      val eZcr = xs.sliding(2).count { case Seq(a, b) => (a >= 0) != (b >= 0) }
      assert(zcr == eZcr && sabs == xs.map(math.abs).sum,
        s"id=$id ch=$c: ($zcr,$sabs) vs ($eZcr,${xs.map(math.abs).sum})")
    }
  }

  test("imageDHash: gradient bits match a hand-computed synthetic image") {
    val imgs = Multimodal.syntheticMedia(
      spark.range(1, 200).toDF("k").filter($"k" % 3 === 0), "k")
    val got = Multimodal.imageDHash(imgs)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, hi, lo) =>
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      def gray(gx: Int, gy: Int): Int = {
        val sx = gx * w / 9; val sy = gy * h / 8
        (0 until 3).map(c => ((id * 7 + sy * 11 + sx * 13 + c * 17) % 256).toInt).sum
      }
      var eHi = 0L; var eLo = 0L
      for (y <- 0 until 8; x <- 0 until 8 if gray(x, y) > gray(x + 1, y)) {
        val idx = y * 8 + x
        if (idx < 32) eLo |= 1L << idx else eHi |= 1L << (idx - 32)
      }
      assert(hi == eHi && lo == eLo, s"id=$id: ($hi,$lo) vs ($eHi,$eLo)")
      assert(hi >= 0 && lo >= 0, "halves never touch the sign bit")
    }
  }

  test("extractFeatures: every modality derives features from REAL decoded media") {
    val feats = Multimodal.extractFeatures(media, dim = 8)
      .select($"media_id", $"features")
      .as[(Long, Seq[Float])].collect().toMap
    feats.foreach { case (_, f) => assert(f.size == 8) }
    // audio row: slot 1 is channels/8, slot 2 is log10(8000)/5 — only the
    // real WAV decode produces these; histogram mass sums to 1
    val audioId = feats.keys.filter(_ % 3 == 1).min
    val af = feats(audioId)
    assert(af(1) == (1 + audioId % 2) / 8f, s"channels slot: ${af(1)}")
    assert(math.abs(af(2) - math.log10(8000.0) / 5.0) < 1e-6)
    assert(math.abs(af.drop(3).sum - 1f) < 1e-3)
    // video row: slots are plane means in (0,1); histogram mass 1
    val videoId = feats.keys.filter(_ % 3 == 2).min
    val vf = feats(videoId)
    assert(vf.take(3).forall(v => v > 0f && v < 1f), s"plane means: ${vf.take(3)}")
    assert(math.abs(vf.drop(3).sum - 1f) < 1e-3)
    // image row: channel means from real pixels (round-7 behavior intact)
    val imageId = feats.keys.filter(_ % 3 == 0).min
    assert(feats(imageId).take(3).forall(v => v >= 0f && v <= 1f))
  }

  test("audioFeatures: full-scale negative sample lands in the last bin, not past it") {
    // |Short.MinValue| = 32768: the unclamped histogram index would be
    // 3 + 32768*bins/32768 = dim (AIOOBE)
    val f = Multimodal.audioFeatures(1, 8000,
      Array[Short](Short.MinValue, Short.MaxValue, 0, -1), dim = 8)
    assert(f.length == 8)
    assert(math.abs(f.drop(3).sum - 1f) < 1e-6, "histogram mass must be 1")
    assert(f(7) == 0.5f, "both full-scale samples in the last bin")
  }

  test("decodeY4m: synthetic round-trip, exact plane bytes, malformed fallback") {
    val id = 8L // w=8, h=4, 3 frames
    val Some((w, h, num, den, frames)) = Multimodal.decodeY4m(Multimodal.syntheticY4m(id))
    assert(w == 8 && h == 4 && num == 25 && den == 1 && frames.length == 3)
    val cSize = (w / 2) * (h / 2)
    assert(frames.forall(_.length == w * h + 2 * cSize))
    for (f <- frames.indices) {
      // spot-check every byte of each plane against the formula
      for (y <- 0 until h; x <- 0 until w) {
        val expect = ((id * 7 + f * 31 + y * 11 + x * 13) % 256).toInt
        assert((frames(f)(y * w + x) & 0xFF) == expect, s"Y($f,$y,$x)")
      }
      for (p <- 1 to 2; y <- 0 until h / 2; x <- 0 until w / 2) {
        val off = w * h + (p - 1) * cSize
        val expect = ((id * 7 + f * 31 + y * 11 + x * 13 + p * 29) % 256).toInt
        assert((frames(f)(off + y * (w / 2) + x) & 0xFF) == expect, s"C$p($f,$y,$x)")
      }
    }
    // malformed: wrong magic, PPM, truncated mid-frame, non-420 colorspace
    assert(Multimodal.decodeY4m(Multimodal.syntheticPpm(3L)).isEmpty)
    assert(Multimodal.decodeY4m(Multimodal.syntheticWav(4L)).isEmpty)
    val clip = Multimodal.syntheticY4m(id)
    assert(Multimodal.decodeY4m(clip.take(clip.length - 5)).isEmpty)
    assert(Multimodal.decodeY4m(
      "YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n".getBytes("US-ASCII") ++
        Array.fill[Byte](48)(0)).isEmpty)
  }

  test("videoStats: exact plane sums and measured duration over the synthetic table") {
    val stats = Multimodal.videoStats(media)
      .as[(Long, Int, Int, Int, Long, Long, Long, Long)].collect()
    assert(stats.nonEmpty)
    stats.foreach { case (id, w, h, nf, ms, sy, su, sv) =>
      assert(id % 3 == 2, "only video rows survive")
      assert(w == (4 + (id % 3) * 2).toInt && h == (4 + (id % 2) * 2).toInt)
      assert(nf == (3 + id % 4).toInt && ms == nf * 40L)
      def planeSum(pw: Int, ph: Int, p: Int): Long =
        (0 until nf).map(f => (0 until ph).map(y => (0 until pw).map(x =>
          (id * 7 + f * 31 + y * 11 + x * 13 + p * 29) % 256).sum).sum).sum
      assert(sy == planeSum(w, h, 0) && su == planeSum(w / 2, h / 2, 1) &&
        sv == planeSum(w / 2, h / 2, 2), s"id=$id")
    }
  }

  test("sampleFrames: one row per sampled timestamp within duration") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000)
    val perVideo = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
        first("meta.duration_ms").as("dur"))
      .as[(Long, Long, Long)].collect()
    assert(perVideo.nonEmpty)
    perVideo.foreach { case (_, n, dur) => assert(n == (dur - 1) / 1000 + 1) }
  }

  test("audioFingerprint: robust to small perturbation, separates different tracks") {
    val rng = new scala.util.Random(5)
    val base = Array.tabulate(4000)(i =>
      (math.sin(i * 0.05) * 8000 + math.sin(i * 0.013) * 4000).toShort)
    val Some((nf, fp)) = Multimodal.audioFingerprint(1, base)
    assert(nf == 4000)
    // identical input → identical fingerprint (determinism)
    assert(Multimodal.audioFingerprint(1, base).get._2 == fp)
    // mild noise (±2% of peak) → small Hamming distance
    val noisy = base.map(s => (s + rng.nextInt(321) - 160).toShort)
    val fpN = Multimodal.audioFingerprint(1, noisy).get._2
    assert(java.lang.Long.bitCount(fp ^ fpN) <= 6,
      s"noise flipped ${java.lang.Long.bitCount(fp ^ fpN)} bits")
    // a different track → far fingerprint
    val other = Array.tabulate(4000)(i =>
      (math.sin(i * 0.021 + 1.0) * 9000).toShort)
    val fpO = Multimodal.audioFingerprint(1, other).get._2
    assert(java.lang.Long.bitCount(fp ^ fpO) >= 8,
      s"different tracks collide: ${java.lang.Long.bitCount(fp ^ fpO)} bits apart")
    // too short for the window count → dropped, never garbage
    assert(Multimodal.audioFingerprint(1, base.take(20)).isEmpty)
    assert(Multimodal.audioFingerprint(0, base).isEmpty)
  }
}
