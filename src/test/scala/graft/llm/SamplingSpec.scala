package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "en", 10), (1L, "en", 600), (2L, "en", 20), (3L, "es", 30),
    (4L, "es", 40), (5L, "fr", 50), (6L, "fr", 60), (7L, "fr", 70),
    (8L, "en", 80), (9L, "en", 90)).toDF("id", "lang", "toks")

  test("hashSample: deterministic, rate-monotone, matches the arithmetic rule") {
    val kept = Sampling.hashSample(docs, col("id"), lit(500))
      .select("id").as[Long].collect().toSet
    val expected = (0L to 9L).filter(i => ((i * 2654435761L) % 1000) < 500).toSet
    assert(kept == expected)
    // repeatable
    val again = Sampling.hashSample(docs, col("id"), lit(500))
      .select("id").as[Long].collect().toSet
    assert(again == kept)
    // a higher rate keeps a superset
    val more = Sampling.hashSample(docs, col("id"), lit(900))
      .select("id").as[Long].collect().toSet
    assert(kept.subsetOf(more))
  }

  test("seqPack: bins are contiguous in order, overshoot bounded by one doc") {
    val packed = Sampling.seqPack(docs, Seq("lang"), "id", "toks", capacity = 100L)
      .select("lang", "id", "toks", "bin_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // bin ids are non-decreasing along id order within a lang
    for (g <- packed.groupBy(_._1).values) {
      val byId = g.sortBy(_._2)
      assert(byId.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      // a row starts a new bin iff the running total before it crossed capacity
      var before = 0L
      for ((_, _, tk, bin) <- byId) {
        assert(bin == before / 100L)
        before += tk
      }
    }
    // the 600-token doc lands alone-ish but never disappears
    assert(packed.length == 10)
  }

  test("mixtureWeights: weights sum to 1, tail upweighted at alpha<1") {
    val w = Sampling.mixtureWeights(docs, "lang", alpha = 0.5)
      .select("lang", "n_rows", "weight")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(math.abs(w.map(_._3).sum - 1.0) < 1e-12)
    val m = w.map(x => x._1 -> x).toMap
    assert(m("en")._2 == 5L && m("es")._2 == 2L && m("fr")._2 == 3L)
    // alpha=0.5 compresses: en share of weights < en share of rows
    assert(m("en")._3 < 0.5 && m("es")._3 > 0.2)
    // exact sqrt rule
    val denom = math.sqrt(5) + math.sqrt(2) + math.sqrt(3)
    assert(m("en")._3 == math.sqrt(5) / denom)
  }

  test("stratifiedFixedSample: exact n per stratum, deterministic, subset of input") {
    val big = (0L until 500L).map(i => (i, if (i % 3 == 0) "en" else "es", 1))
      .toDF("id", "lang", "toks")
    val out = Sampling.stratifiedFixedSample(big, Seq("lang"), col("id"), n = 25)
      .select("lang", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.count(_._1 == "en") == 25 && out.count(_._1 == "es") == 25)
    val again = Sampling.stratifiedFixedSample(big, Seq("lang"), col("id"), n = 25)
      .select("lang", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSet == again.toSet)
    // a stratum smaller than n survives whole
    val tiny = Sampling.stratifiedFixedSample(docs, Seq("lang"), col("id"), n = 100)
    assert(tiny.count() == docs.count())
  }

  test("quantileFilter drops exactly the below-threshold rows per stratum") {
    val df = Seq(
      ("en", 1L, 10), ("en", 2L, 20), ("en", 3L, 30), ("en", 4L, 40), ("en", 5L, 50),
      ("es", 6L, 1), ("es", 7L, 2), ("es", 8L, 100)).toDF("lang", "id", "score")
    val kept = Sampling.quantileFilter(df, Seq("lang"), "score", q = 0.25)
      .select("id").as[Long].collect().toSet
    // en: q25 of (10,20,30,40,50) = 20 -> drop id 1; es: q25 of (1,2,100) = 1.5 -> drop id 6
    assert(kept == Set(2L, 3L, 4L, 5L, 7L, 8L))
  }

  test("weightedSample: deterministic, per-stratum k, weight-proportional, no zero-weight rows") {
    val df = (1L to 200L).map { i =>
      val lang = if (i <= 100) "en" else "es"
      // weights: ids 1-10 get weight 1000, the rest weight 1 (and id 50 gets 0)
      val w = if (i % 100 <= 10 && i % 100 >= 1) 1000 else if (i == 50) 0 else 1
      (i, lang, w)
    }.toDF("id", "lang", "w")
    val take = (d: org.apache.spark.sql.DataFrame) =>
      Sampling.weightedSample(d, col("id"), Seq("lang"), col("w"), k = 8)
        .select("lang", "id").as[(String, Long)].collect().toSet
    val s1 = take(df)
    assert(s1 == take(df), "must be reproducible run to run")
    assert(s1.count(_._1 == "en") == 8 && s1.count(_._1 == "es") == 8)
    assert(!s1.exists(_._2 == 50L), "zero-weight rows are never sampled")
    // heavy rows (weight 1000, 10 per stratum of ~100) should dominate the
    // k=8 sample in each stratum
    val heavyEn = s1.filter(_._1 == "en").count(p => p._2 % 100 >= 1 && p._2 % 100 <= 10)
    val heavyEs = s1.filter(_._1 == "es").count(p => p._2 % 100 >= 1 && p._2 % 100 <= 10)
    assert(heavyEn >= 6 && heavyEs >= 6, s"weight-proportionality: en=$heavyEn es=$heavyEs of 8")
  }

  test("hashedImportanceTopK: target-heavy docs outrank, masses are exact") {
    import org.apache.spark.sql.functions._
    // target corpus speaks "tt"; raw noise speaks "zz"; doc 5 is mixed
    val docs = Seq(
      (1L, "tt tt tt", true), (2L, "tt tt zz", true),
      (3L, "zz zz zz", false), (4L, "zz zz tt", false),
      (5L, "tt zz", false)).toDF("doc_id", "text", "is_en")
    val got = Sampling.hashedImportanceTopK(docs, "doc_id", "text",
        isTarget = col("is_en"), k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // bucket stats: T(tt)=5 (docs 1,2), R(tt)=7; T(zz)=1, R(zz)=7
    // doc1: 3 tt -> t=15 r=21; doc3: 3 zz -> t=3 r=21
    val byId = got.toMap
    assert(byId(1L) == (15L, 21L, 15.0 / 21))
    assert(byId(3L) == (3L, 21L, 3.0 / 21))
    // ranking: pure-target docs first, pure-noise last
    assert(got.head._1 == 1L && got.last._1 == 3L)
    assert(byId(2L)._3 > byId(4L)._3)
  }

  test("chunkSpans: full coverage with overlap, short tail, no empty chunks") {
    val df = Seq((1L, 100), (2L, 64), (3L, 65), (4L, 1)).toDF("id", "n")
    val out = Sampling.chunkSpans(df, "n", window = 64, stride = 48)
      .select("id", "chunk_id", "token_start", "chunk_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    // n=100: chunks at 0 (len 64) and 48 (len 52) cover [0,100); no chunk at 96
    // (its 4 tokens were already inside chunk 1's window)
    assert(out(1L).toSet == Set((1L, 0L, 0L, 64L), (1L, 1L, 48L, 52L)))
    // n=64 fits one window exactly; n=65 needs a 17-token tail chunk
    assert(out(2L).toSet == Set((2L, 0L, 0L, 64L)))
    assert(out(3L).toSet == Set((3L, 0L, 0L, 64L), (3L, 1L, 48L, 17L)))
    // n=1: one 1-token chunk
    assert(out(4L).toSet == Set((4L, 0L, 0L, 1L)))
    // invariants across all rows: len in (0, window], start covered by stride
    for (g <- out.values; (_, cid, start, len) <- g) {
      assert(len > 0 && len <= 64 && start == cid * 48)
    }
  }

  test("hrwShard: deterministic, roughly balanced, minimally disruptive on grow") {
    import spark.implicits._
    val keys = (1L to 2000L).toDF("id")
    val a4 = Sampling.hrwShard(keys, "id", 4, "s4")
    // deterministic: a second run is identical
    assert(Sampling.hrwShard(keys, "id", 4, "s4").except(a4).isEmpty)
    // roughly balanced: every shard holds 25% +/- 10 points
    val sizes = a4.groupBy("s4").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3))
    sizes.values.foreach(n => assert(n > 300 && n < 700, sizes.toString))
    // grow 4 -> 5: every mover lands ON the new shard, ~1/5 move
    val joined = a4.join(Sampling.hrwShard(keys, "id", 5, "s5"), "id")
      .select($"s4", $"s5").collect().map(r => (r.getInt(0), r.getInt(1)))
    val moved = joined.count { case (a, b) => a != b }
    assert(joined.forall { case (a, b) => a == b || b == 4 })
    assert(moved > 2000 / 5 - 150 && moved < 2000 / 5 + 150, s"moved=$moved")
  }
}
