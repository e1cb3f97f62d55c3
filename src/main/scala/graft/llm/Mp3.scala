package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * MP3 (MPEG-1 Audio Layer III, ISO/IEC 11172-3) FRAME-HEADER walk — the
 * metadata pass a crawl-audio pipeline runs on every .mp3 before deciding
 * what to keep: skip the ID3v2 tag (syncsafe size), then walk the frame
 * chain by header arithmetic (frame length = 144·bitrate/samplerate +
 * padding for MPEG-1 Layer III), collecting sample rate, bitrate, channel
 * mode, frame/sample counts, and payload byte totals — duration and
 * transport cost WITHOUT any audio DSP. Full Layer-III synthesis decode
 * (hybrid filterbank, Huffman spectra) is out of scope by design; this is
 * the container/metadata half, exactly like [[Mp4]]'s box walk, and it is
 * what quality filters actually consume (duration, bitrate, channel
 * layout, truncation detection).
 *
 * Walk contract: ≥ 1 valid frame required; the walk stops cleanly at the
 * first non-sync byte after a valid chain (ID3v1 'TAG' trailers and junk
 * tails are tolerated), and every subsequent frame must agree with the
 * first on version/layer/samplerate (mixed chains are rejected — the
 * crawl-reality signal for corrupt concatenations).
 *
 * Scale shape: narrow per-row map, no shuffle — the codec-family shape.
 */
object Mp3 {

  private val bitrateKbps = // MPEG-1 Layer III bitrate table, index 1..14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val sampleRates = Array(44100, 48000, 32000) // index 0..2

  /** Parsed chain: (sampleRate, bitrateKbps of first frame, channelMode,
    * nFrames, totalPayloadBytes, payloadByteSum). */
  final case class Mp3Info(sampleRate: Int, bitrateKbps: Int, channelMode: Int,
                           nFrames: Int, payloadBytes: Long, payloadSum: Long)

  /** Deterministic MPEG-1 Layer III frame chain for a key: `3 + id % 4`
    * frames at samplerate index `id % 3` and bitrate index `9 + id % 3`
    * (128/160/192 kbps), padding alternating per frame, each frame's
    * payload filled with the constant byte `(id·31 + frame·17) % 251` —
    * so every stat the walk reports has a closed form the oracle
    * replays. Prefixed with a REAL ID3v2 tag whose syncsafe size is
    * `13·(id % 4)` and, for `id % 5 == 0`, suffixed with an ID3v1 'TAG'
    * trailer the walk must stop at. */
  def syntheticMp3(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val tagLen = (13 * (id % 4)).toInt
    // ID3v2.3 header: "ID3", version, flags, syncsafe 28-bit size
    out.write('I'); out.write('D'); out.write('3'); out.write(3); out.write(0); out.write(0)
    out.write((tagLen >> 21) & 0x7F); out.write((tagLen >> 14) & 0x7F)
    out.write((tagLen >> 7) & 0x7F); out.write(tagLen & 0x7F)
    (0 until tagLen).foreach(j => out.write((j * 3 + 1) & 0x7F))
    val srIdx = (id % 3).toInt
    val brIdx = 9 + (id % 3).toInt
    val mode = (id % 4).toInt // 0 stereo, 1 joint, 2 dual, 3 mono
    val n = (3 + id % 4).toInt
    (0 until n).foreach { f =>
      val pad = ((id + f) % 2).toInt
      val fs = 144000 * bitrateKbps(brIdx) / sampleRates(srIdx) + pad
      // header: sync FFF, MPEG1 (11), Layer III (01), no CRC (1)
      out.write(0xFF); out.write(0xFB)
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(mode << 6)
      val v = ((id * 31 + f * 17) % 251).toInt
      (0 until fs - 4).foreach(_ => out.write(v))
    }
    if (id % 5 == 0) { // ID3v1 trailer: the walk must stop, not choke
      out.write('T'); out.write('A'); out.write('G')
      (0 until 125).foreach(_ => out.write(0x20))
    }
    out.toByteArray
  }

  /** Never throws on corrupt bytes (the codec-family contract, fuzz-
    * gated): structural checks are explicit, NonFatal is the backstop. */
  def parseMp3(payload: Array[Byte]): Option[Mp3Info] =
    try parseMp3Impl(payload)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseMp3Impl(payload: Array[Byte]): Option[Mp3Info] = {
    if (payload == null || payload.length < 4) return None
    var i = 0
    // ID3v2: "ID3" + 2 version + 1 flags + 4 syncsafe size bytes
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
      val size = ((payload(6) & 0x7F) << 21) | ((payload(7) & 0x7F) << 14) |
        ((payload(8) & 0x7F) << 7) | (payload(9) & 0x7F)
      i = 10 + size
      if (i >= payload.length) return None
    }
    var sr = -1; var br0 = -1; var mode = -1
    var nFrames = 0
    var bytes = 0L
    var sum = 0L
    var done = false
    while (!done && i + 4 <= payload.length) {
      val b0 = payload(i) & 0xFF; val b1 = payload(i + 1) & 0xFF
      if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) done = true // sync lost: stop
      else {
        val version = (b1 >> 3) & 0x3
        val layer = (b1 >> 1) & 0x3
        if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
        val b2 = payload(i + 2) & 0xFF
        val brIdx = (b2 >> 4) & 0xF
        val srIdx = (b2 >> 2) & 0x3
        val pad = (b2 >> 1) & 0x1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/bad
        val b3 = payload(i + 3) & 0xFF
        val m = (b3 >> 6) & 0x3
        if (sr < 0) { sr = sampleRates(srIdx); br0 = bitrateKbps(brIdx); mode = m }
        else if (sr != sampleRates(srIdx) || mode != m) return None // mixed chain
        val fs = 144000 * bitrateKbps(brIdx) / sr + pad
        if (fs < 4 || i + fs > payload.length) return None // truncated frame
        var j = i + 4
        while (j < i + fs) { sum += payload(j) & 0xFF; j += 1 }
        bytes += fs - 4
        nFrames += 1
        i += fs
      }
    }
    if (nFrames == 0) None
    else Some(Mp3Info(sr, br0, mode, nFrames, bytes, sum))
  }

  /** Exact integer stats from the REAL frame walk — the oracle-checkable
    * face (m25 replays every field from [[syntheticMp3]]'s closed form):
    * rates, channel mode, frame/sample counts (1152 samples per MPEG-1
    * Layer III frame — duration is the exact rational n_samples /
    * sample_rate), payload byte totals and sums. Non-MP3 rows drop. */
  def mp3Stats(media: DataFrame): DataFrame = {
    val dec = udf { (payload: Array[Byte]) =>
      parseMp3(payload).map(v => (v.sampleRate, v.bitrateKbps, v.channelMode,
        v.nFrames, v.nFrames.toLong * 1152L, v.payloadBytes, v.payloadSum)).orNull
    }
    media.withColumn("__a", dec(col("payload")))
      .filter(col("__a").isNotNull)
      .select(col("media_id"),
        col("__a._1").as("sample_rate"), col("__a._2").as("bitrate_kbps"),
        col("__a._3").as("channel_mode"), col("__a._4").as("n_frames"),
        col("__a._5").as("n_samples"), col("__a._6").as("payload_bytes"),
        col("__a._7").as("payload_sum"))
  }
}
