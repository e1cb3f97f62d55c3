package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Mp3Spec extends SparkSpec {

  import spark.implicits._

  test("synthetic chains parse back: rates, mode, frames, payload sums, ID3 skip/stop") {
    for (id <- 1L to 20L) {
      val v = Mp3.parseMp3(Mp3.syntheticMp3(id)).getOrElse(fail(s"id=$id did not parse"))
      val srIdx = (id % 3).toInt
      val n = (3 + id % 4).toInt
      assert(v.sampleRate == Array(44100, 48000, 32000)(srIdx), s"id=$id")
      assert(v.bitrateKbps == Array(128, 160, 192)(srIdx), s"id=$id")
      assert(v.channelMode == (id % 4).toInt && v.nFrames == n, s"id=$id")
      val expected = (0 until n).map { f =>
        val pad = ((id + f) % 2).toInt
        val fs = 144000 * v.bitrateKbps / v.sampleRate + pad
        (fs - 4).toLong * (((id * 31 + f * 17) % 251))
      }.sum
      assert(v.payloadSum == expected, s"id=$id")
    }
  }

  test("malformed inputs return None, never throw") {
    assert(Mp3.parseMp3(null).isEmpty)
    assert(Mp3.parseMp3(Array[Byte]()).isEmpty)
    assert(Mp3.parseMp3("plain text, definitely not mpeg".getBytes).isEmpty)
    val good = Mp3.syntheticMp3(7L)
    assert(Mp3.parseMp3(good.dropRight(5)).isEmpty) // truncated final frame
    // a frame chain that switches samplerate mid-stream is a corrupt concat
    val a = Mp3.syntheticMp3(3L) // sr idx 0
    val b = Mp3.syntheticMp3(4L) // sr idx 1
    assert(Mp3.parseMp3(a ++ b.drop(10 + 13 * (4 % 4))).isEmpty)
    // an MP4 payload is not an MP3 frame chain
    assert(Mp3.parseMp3(Mp4.syntheticMp4(2L)).isEmpty)
  }

  test("mp3Stats: dataframe face matches the direct parse") {
    val media = Seq(5L, 6L, 10L).toDF("media_id")
      .withColumn("payload", udf((id: Long) => Mp3.syntheticMp3(id)).apply(col("media_id")))
    val got = Mp3.mp3Stats(media).orderBy("media_id").collect()
    assert(got.length == 3)
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val v = Mp3.parseMp3(Mp3.syntheticMp3(id)).get
      assert(r.getAs[Int]("sample_rate") == v.sampleRate)
      assert(r.getAs[Long]("n_samples") == v.nFrames * 1152L)
      assert(r.getAs[Long]("payload_sum") == v.payloadSum)
    }
  }
}
