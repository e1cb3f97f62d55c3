package graft.llm

import graft.SparkSpec

/**
 * Deterministic corruption fuzz over the WHOLE codec family: crawl
 * payloads arrive truncated, bit-flipped, and mislabeled as a matter of
 * course, and every decoder's contract is "None or a value — NEVER a
 * throw" (a single uncaught exception in a narrow decode map kills the
 * task, fails the stage, and at 100 TB some byte pattern WILL hit every
 * branch). Seeded RNG, so a failure reproduces exactly.
 */
class CodecFuzzSpec extends SparkSpec {

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "decodeImage" -> (b => Multimodal.decodeImage(b)),
    "decodeAudio" -> (b => Multimodal.decodeAudio(b)),
    "decodeY4m" -> (b => Multimodal.decodeY4m(b)),
    "decodeFlac" -> (b => Flac.decodeFlac(b)),
    "parseMp4" -> (b => Mp4.parseMp4(b)),
    "parseMp4Audio" -> (b => Mp4.parseMp4Audio(b)),
    "parseMp3" -> (b => Mp3.parseMp3(b)),
    "decodeWebp" -> (b => Webp.decodeWebp(b)),
    "decodeTiff" -> (b => Tiff.decodeTiff(b)))

  private def fixtures(id: Long): Seq[(String, Array[Byte])] = Seq(
    "ppm" -> Multimodal.syntheticPpm(id),
    "png" -> Multimodal.syntheticPng(id),
    "gif" -> Multimodal.syntheticGif(id),
    "bmp" -> Multimodal.syntheticBmp(id),
    "jpeg" -> Multimodal.syntheticJpeg(id),
    "aiff" -> Multimodal.syntheticAiff(id),
    "wav" -> Multimodal.syntheticWav(id),
    "wavext" -> Multimodal.syntheticWavExt(id),
    "flac" -> Flac.syntheticFlac(id),
    "y4m" -> Multimodal.syntheticY4m(id),
    "mp4" -> Mp4.syntheticMp4(id),
    "mp4a" -> Mp4.syntheticMp4Audio(id),
    "mp3" -> Mp3.syntheticMp3(id),
    "webp" -> Webp.syntheticWebp(id),
    "tiff" -> Tiff.syntheticTiff(id))

  test("every decoder survives random byte flips on every format (seeded)") {
    val rnd = new scala.util.Random(42)
    for (id <- 1L to 10L; (fmt, payload) <- fixtures(id); trial <- 1 to 10) {
      val corrupt = payload.clone()
      val flips = 1 + rnd.nextInt(8)
      (1 to flips).foreach { _ =>
        corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      }
      for ((dn, dec) <- decoders) {
        try dec(corrupt)
        catch {
          case e: Throwable =>
            fail(s"$dn threw ${e.getClass.getSimpleName} on flipped $fmt " +
              s"(id=$id trial=$trial flips=$flips): ${e.getMessage}")
        }
      }
    }
  }

  test("every decoder survives truncation at every 1/16 step of every format") {
    for (id <- 1L to 4L; (fmt, payload) <- fixtures(id); step <- 0 to 15) {
      val cut = java.util.Arrays.copyOf(payload, payload.length * step / 16)
      for ((dn, dec) <- decoders) {
        try dec(cut)
        catch {
          case e: Throwable =>
            fail(s"$dn threw ${e.getClass.getSimpleName} on $fmt truncated " +
              s"to ${cut.length}/${payload.length} (id=$id): ${e.getMessage}")
        }
      }
    }
  }

  test("cross-format confusion: every decoder fed every OTHER format stays silent") {
    for (id <- 1L to 3L; (fmt, payload) <- fixtures(id); (dn, dec) <- decoders) {
      try dec(payload)
      catch {
        case e: Throwable =>
          fail(s"$dn threw ${e.getClass.getSimpleName} on intact $fmt (id=$id): ${e.getMessage}")
      }
    }
  }

  test("image decoders are MUTUALLY EXCLUSIVE: None on every other image format") {
    // stronger than never-throw: a decoder accepting a foreign format
    // would make decodeImage's dispatch ORDER load-bearing — magic-byte
    // routing must be unambiguous, not first-match-lucky
    val imageDecoders: Seq[(String, Array[Byte] => Option[_])] = Seq(
      "ppm" -> (b => Multimodal.decodePpm(b)),
      "png" -> (b => Multimodal.decodePng(b)),
      "bmp" -> (b => Multimodal.decodeBmp(b)),
      "gif" -> (b => Multimodal.decodeGif(b)),
      "jpeg" -> (b => Multimodal.decodeJpeg(b)),
      "webp" -> (b => Webp.decodeWebp(b)),
      "tiff" -> (b => Tiff.decodeTiff(b)))
    val imageFixtures: Seq[(String, Long => Array[Byte])] = Seq(
      "ppm" -> Multimodal.syntheticPpm,
      "png" -> (id => Multimodal.syntheticPng(id)),
      "bmp" -> Multimodal.syntheticBmp,
      "gif" -> (id => Multimodal.syntheticGif(id)),
      "jpeg" -> (id => Multimodal.syntheticJpeg(id)),
      "webp" -> Webp.syntheticWebp,
      "tiff" -> Tiff.syntheticTiff)
    for (id <- 1L to 4L; (fmt, make) <- imageFixtures;
         (dn, dec) <- imageDecoders) {
      val got = dec(make(id))
      if (dn == fmt) assert(got.isDefined, s"$dn rejected its own $fmt (id=$id)")
      else assert(got.isEmpty, s"$dn ACCEPTED a $fmt payload (id=$id)")
    }
  }
}
