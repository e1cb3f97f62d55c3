package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** TIFF decode: every synthetic variant (both byte orders, all three
  * baseline compressions, gray/RGB/palette) round-trips bit-exactly to its
  * closed form; malformed inputs return None. Corruption fuzz lives in
  * CodecFuzzSpec with the rest of the codec family. */
class TiffSpec extends AnyFunSuite {

  private def expected(id: Long): (Int, Int, Array[Byte]) = {
    val w = (8 + id % 9).toInt
    val h = (5 + id % 5).toInt
    val v = (id % 4).toInt
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = v match {
        case 1 =>
          val gr = ((id * 7 + y * 3 + x / 4) % 256).toInt
          (gr, gr, gr)
        case 3 =>
          val c = ((id + x + 2L * y) % 4).toInt
          (((id * 5 + c * 31) % 256).toInt, ((id * 3 + c * 47) % 256).toInt,
            ((id * 11 + c * 61) % 256).toInt)
        case _ =>
          (((id * 7 + y * 11 + x * 13) % 256).toInt,
            ((id * 7 + y * 11 + x * 13 + 17) % 256).toInt,
            ((id * 7 + y * 11 + x * 13 + 34) % 256).toInt)
      }
      rgb((y * w + x) * 3) = r.toByte
      rgb((y * w + x) * 3 + 1) = g.toByte
      rgb((y * w + x) * 3 + 2) = b.toByte
    }
    (w, h, rgb)
  }

  test("all four variants round-trip bit-exactly (both byte orders, all compressions)") {
    (1L to 80L).foreach { id =>
      val got = Tiff.decodeTiff(Tiff.syntheticTiff(id))
      assert(got.isDefined, s"id=$id (variant ${id % 4}) failed to decode")
      val (w, h, rgb) = got.get
      val (ew, eh, ergb) = expected(id)
      assert(w == ew && h == eh, s"id=$id dims ($w,$h) != ($ew,$eh)")
      assert(java.util.Arrays.equals(rgb, ergb),
        s"id=$id (variant ${id % 4}): pixel mismatch")
    }
  }

  test("LZW early change: noisy buffers cross every width bump and round-trip") {
    // noisy bytes force a new dictionary entry per ~2 input bytes, so 16k
    // bytes pass 510 AND 1022 AND 2046 entries — the early-change
    // thresholds where an off-by-one desynchronizes every later code
    val noisy = Array.tabulate(16384)(i => ((i * 2654435761L >> 7) & 0xFF).toByte)
    assert(java.util.Arrays.equals(Tiff.lzwRoundTripForTest(noisy), noisy))
    // and a run-heavy buffer (long matches, slow dictionary growth)
    val runs = Array.tabulate(16384)(i => ((i / 512) & 0xFF).toByte)
    assert(java.util.Arrays.equals(Tiff.lzwRoundTripForTest(runs), runs))
  }

  test("malformed inputs return None, never throw") {
    assert(Tiff.decodeTiff(null).isEmpty)
    assert(Tiff.decodeTiff(Array.emptyByteArray).isEmpty)
    assert(Tiff.decodeTiff("II*<".getBytes("US-ASCII")).isEmpty)
    val t = Tiff.syntheticTiff(5L)
    // corrupt the IFD offset
    val badOff = t.clone(); badOff(4) = 0x7F
    assert(Tiff.decodeTiff(badOff).isEmpty)
    // truncate mid-strip
    assert(Tiff.decodeTiff(java.util.Arrays.copyOf(t, t.length - 4)).isEmpty)
    // hostile dims: flip width bytes to something enormous
    val hostile = t.clone()
    hostile(10) = 0xFF.toByte; hostile(11) = 0xFF.toByte
    Tiff.decodeTiff(hostile) // must not throw or over-allocate
  }

  test("decodeImage dispatch routes TIFF payloads") {
    val p = Tiff.syntheticTiff(9L)
    val a = Multimodal.decodeImage(p)
    val b = Tiff.decodeTiff(p)
    assert(a.isDefined && b.isDefined)
    assert(a.get._1 == b.get._1 && a.get._2 == b.get._2 &&
      java.util.Arrays.equals(a.get._3, b.get._3))
  }
}
