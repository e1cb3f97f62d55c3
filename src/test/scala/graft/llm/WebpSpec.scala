package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** VP8L (lossless WebP) decode: every synthetic variant round-trips to
  * its closed-form pixels EXACTLY (lossless is bit-exact by definition),
  * the RIFF walk skips foreign chunks, and malformed inputs return None.
  * Corruption fuzz lives in CodecFuzzSpec with the rest of the codecs. */
class WebpSpec extends AnyFunSuite {

  private def expected(id: Long): (Int, Int, Array[Byte]) = {
    val w = (8 + id % 9).toInt
    val h = (5 + id % 5).toInt
    val v = (id % 6).toInt
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = v match {
        case 0 =>
          (((id * 7 + y * 11 + (x % 4) * 13) % 256).toInt,
            ((id * 7 + y * 11 + (x % 4) * 13 + 17) % 256).toInt,
            ((id * 7 + y * 11 + (x % 4) * 13 + 34) % 256).toInt)
        case 2 =>
          val c = ((id + x + 2L * y) % 4).toInt
          (((id * 5 + c * 31) % 256).toInt, ((id * 3 + c * 47) % 256).toInt,
            ((id * 11 + c * 61) % 256).toInt)
        case 3 =>
          (((id * 7 + x * 13) % 256).toInt, ((id * 7 + x * 13 + 17) % 256).toInt,
            ((id * 7 + x * 13 + 34) % 256).toInt)
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

  test("all six encoding variants round-trip bit-exactly to the closed form") {
    // ids 1..90 hit every (variant, w, h) combination several times over
    (1L to 90L).foreach { id =>
      val got = Webp.decodeWebp(Webp.syntheticWebp(id))
      assert(got.isDefined, s"id=$id (variant ${id % 6}) failed to decode")
      val (w, h, rgb) = got.get
      val (ew, eh, ergb) = expected(id)
      assert(w == ew && h == eh, s"id=$id dims ($w,$h) != ($ew,$eh)")
      assert(java.util.Arrays.equals(rgb, ergb),
        s"id=$id (variant ${id % 6}): pixel mismatch")
    }
  }

  test("RIFF walk: a foreign chunk before VP8L is skipped, odd lengths padded") {
    val base = Webp.syntheticWebp(7L)
    // splice an odd-length metadata chunk between WEBP and VP8L
    val extra = Array[Byte]('X', 'M', 'P', ' ', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // patch the RIFF size
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xFF).toByte
    spliced(5) = ((riffLen >> 8) & 0xFF).toByte
    val got = Webp.decodeWebp(spliced)
    val want = Webp.decodeWebp(base)
    assert(got.isDefined && want.isDefined)
    assert(got.get._1 == want.get._1 && got.get._2 == want.get._2 &&
      java.util.Arrays.equals(got.get._3, want.get._3))
  }

  test("malformed inputs return None, never throw") {
    assert(Webp.decodeWebp(null).isEmpty)
    assert(Webp.decodeWebp(Array.emptyByteArray).isEmpty)
    assert(Webp.decodeWebp("RIFF1234WEBP".getBytes("US-ASCII")).isEmpty)
    // lossy VP8 chunk → None (not supported, not a crash)
    val lossy = "RIFF".getBytes ++ Array[Byte](20, 0, 0, 0) ++
      "WEBPVP8 ".getBytes ++ Array[Byte](8, 0, 0, 0) ++ new Array[Byte](8)
    assert(Webp.decodeWebp(lossy).isEmpty)
    // bad VP8L signature byte
    val bad = Webp.syntheticWebp(3L)
    bad(20) = 0x00
    assert(Webp.decodeWebp(bad).isEmpty)
  }

  test("decodeImage dispatch routes WebP payloads") {
    val p = Webp.syntheticWebp(11L)
    val viaDispatch = Multimodal.decodeImage(p)
    val direct = Webp.decodeWebp(p)
    assert(viaDispatch.isDefined && direct.isDefined)
    assert(viaDispatch.get._1 == direct.get._1 &&
      viaDispatch.get._2 == direct.get._2 &&
      java.util.Arrays.equals(viaDispatch.get._3, direct.get._3))
  }
}
