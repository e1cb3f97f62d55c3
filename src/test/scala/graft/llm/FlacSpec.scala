package graft.llm

class FlacSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def expected(id: Long): (Int, Array[Short]) = {
    val nc = (1 + id % 2).toInt
    val nf = (100 + id % 50).toInt
    val out = new Array[Short](nc * nf)
    var i = 0
    while (i < nf) {
      var ch = 0
      while (ch < nc) {
        out(i * nc + ch) = (((id * 31 + i * 7 + ch * 13) % 4096) - 2048).toShort
        ch += 1
      }
      i += 1
    }
    (nc, out)
  }

  test("lossless round-trip across every encoding branch") {
    // ids 0..31 cover: mono/stereo, independent + mid/side decorrelation,
    // fixed-2 (partition orders 0 AND 1), LPC-2 (5-bit Rice params),
    // verbatim, fixed-1 + raw-bits escape, 2- and 3-frame streams, and
    // partial tail blocks down to the < 4-sample verbatim fallback
    // (id 29 -> nf 129 -> tail block of 1).
    (0L until 32L).foreach { id =>
      val (nc, want) = expected(id)
      val got = Flac.decodeFlac(Flac.syntheticFlac(id))
      assert(got.isDefined, s"id=$id failed to decode")
      val (gnc, grate, gs) = got.get
      assert(gnc == nc, s"id=$id channels")
      assert(grate == 8000, s"id=$id rate")
      assert(gs.toSeq == want.toSeq, s"id=$id samples")
    }
  }

  test("mid/side decorrelation is exercised and exact (id%4==3 stereo)") {
    val id = 7L // stereo, mid/side
    val (_, want) = expected(id)
    val (nc, _, gs) = Flac.decodeFlac(Flac.syntheticFlac(id)).get
    assert(nc == 2)
    assert(gs.toSeq == want.toSeq)
  }

  test("CRC catches corruption anywhere in the stream") {
    val clean = Flac.syntheticFlac(5L)
    assert(Flac.decodeFlac(clean).isDefined)
    // flip one byte in the frame data region (past the 42-byte header+SI)
    val corrupt = clean.clone()
    corrupt(60) = (corrupt(60) ^ 0x40).toByte
    assert(Flac.decodeFlac(corrupt).isEmpty)
    // truncation fails loudly too
    assert(Flac.decodeFlac(clean.take(clean.length - 3)).isEmpty)
  }

  test("non-FLAC payloads are rejected, WAVs route through decodeAudio") {
    assert(Flac.decodeFlac("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Flac.decodeFlac(Array[Byte](1, 2, 3)).isEmpty)
    // the dispatch: FLAC magic -> Flac, RIFF -> decodeWav
    def norm(d: Option[(Int, Int, Array[Short])]) = d.map { case (a, b, s) => (a, b, s.toSeq) }
    val wav = Multimodal.syntheticWav(1L)
    assert(norm(Multimodal.decodeAudio(wav)) == norm(Multimodal.decodeWav(wav)))
    val flac = Flac.syntheticFlac(1L)
    assert(norm(Multimodal.decodeAudio(flac)).isDefined)
    assert(norm(Multimodal.decodeAudio(flac)) == norm(Flac.decodeFlac(flac)))
  }
}
