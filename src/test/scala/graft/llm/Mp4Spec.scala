package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Mp4Spec extends SparkSpec {

  import spark.implicits._

  test("synthetic MP4 parses back: brand, codec, timescale, stts, stsc/stco expansion") {
    for (id <- 1L to 12L) {
      val v = Mp4.parseMp4(Mp4.syntheticMp4(id)).getOrElse(fail(s"id=$id did not parse"))
      assert(v.brand == "isom" && v.codec == "jpeg" && v.timescale == 600L)
      val n = (2 + id % 3).toInt
      assert(v.samples.length == n, s"id=$id")
      assert(v.durations.toSeq == Seq.fill(n)(100 + id % 5))
      // every extracted sample is a complete, decodable JPEG matching the
      // planted generator byte-for-byte — the two-chunk stsc/stco walk
      // must reassemble offsets exactly
      (0 until n).foreach { k =>
        assert(v.samples(k).sameElements(Multimodal.syntheticJpeg(id * 101 + k)),
          s"id=$id sample=$k bytes differ")
        assert(Multimodal.decodeImage(v.samples(k)).isDefined)
      }
    }
  }

  test("malformed inputs return None, never throw") {
    val good = Mp4.syntheticMp4(3L)
    assert(Mp4.parseMp4(null).isEmpty)
    assert(Mp4.parseMp4(Array[Byte]()).isEmpty)
    assert(Mp4.parseMp4("not an mp4 at all, nope".getBytes).isEmpty)
    assert(Mp4.parseMp4(good.take(40)).isEmpty) // moov truncated away
    // corrupt the mdat chunk offset table: stco points past the file
    val corrupt = good.clone()
    val idx = {
      val pat = "stco".getBytes("US-ASCII")
      (0 until corrupt.length - 4).find(i =>
        corrupt(i) == pat(0) && corrupt(i + 1) == pat(1) &&
          corrupt(i + 2) == pat(2) && corrupt(i + 3) == pat(3)).get
    }
    corrupt(idx + 12) = 0x7F.toByte // first offset -> huge
    assert(Mp4.parseMp4(corrupt).isEmpty)
    // a WAV payload is not ISO-BMFF
    assert(Mp4.parseMp4(Multimodal.syntheticPpm(1L)).isEmpty)
  }

  test("audio trak + co64: parse back, PCM sums exact, video walk rejects it") {
    for (id <- 1L to 9L) {
      val payload = Mp4.syntheticMp4Audio(id)
      // the file carries co64 only — no stco anywhere
      assert(!new String(payload, "ISO-8859-1").contains("stco"), s"id=$id")
      val v = Mp4.parseMp4Audio(payload).getOrElse(fail(s"id=$id did not parse"))
      assert(v.codec == "twos" && v.timescale == 8000L)
      val n = (2 + id % 3).toInt
      assert(v.samples.length == n && v.durations.sum == n * 80L)
      val expected = (for (k <- 0 until n; j <- 0 until 80)
        yield ((id * 13 + k * 7 + j) % 401) - 200).sum
      var sum = 0L
      v.samples.foreach { s =>
        var j = 0
        while (j < s.length) {
          sum += ((s(j) << 8) | (s(j + 1) & 0xFF)).toShort; j += 2
        }
      }
      assert(sum == expected, s"id=$id")
      // handler selection: the video walk must NOT return the audio trak
      assert(Mp4.parseMp4(payload).isEmpty, s"id=$id video walk matched soun")
      // and vice versa
      assert(Mp4.parseMp4Audio(Mp4.syntheticMp4(id)).isEmpty)
    }
  }

  test("mp4VideoStats: sums equal per-sample decoded image sums") {
    val media = Seq(1L, 2L, 7L).toDF("media_id")
      .withColumn("payload", udf((id: Long) => Mp4.syntheticMp4(id)).apply(col("media_id")))
    val got = Mp4.mp4VideoStats(media).orderBy("media_id").collect()
    assert(got.length == 3)
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = (2 + id % 3).toInt
      assert(r.getAs[Int]("n_samples") == n)
      assert(r.getAs[Long]("duration") == n * (100 + id % 5))
      assert(r.getAs[Int]("width") == 8 * (2 + (id * 101) % 3).toInt)
      // reference sums straight from decodeImage over the planted JPEGs
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until n).foreach { k =>
        val (w, h, rgb) = Multimodal.decodeImage(
          Multimodal.syntheticJpeg(id * 101 + k)).get
        var p = 0
        while (p < w * h * 3) {
          sr += rgb(p) & 0xFF; sg += rgb(p + 1) & 0xFF; sb += rgb(p + 2) & 0xFF
          p += 3
        }
      }
      assert(r.getAs[Long]("sum_r") == sr && r.getAs[Long]("sum_g") == sg &&
        r.getAs[Long]("sum_b") == sb, s"id=$id")
    }
  }
}
