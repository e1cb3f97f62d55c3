package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup
    (4L, "completely different content about spark catalyst optimizer internals and shuffles"),
    (5L, "another unrelated text mentioning minhash signatures and jaccard similarity estimates")
  ).toDF("doc_id", "text")

  test("dupNgramSpans merges overlapping duplicated windows into maximal spans") {
    // docs 1 and 2 share a 9-token run (s1..s9) => two duplicated 8-gram
    // windows each, overlapping => ONE merged span of 9 covered tokens
    val spanDocs = Seq(
      (1L, "x1 x2 s1 s2 s3 s4 s5 s6 s7 s8 s9 y1"),
      (2L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 z1 z2 z3"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"),
      (4L, "w1 w2 w3") // shorter than one window
    ).toDF("doc_id", "text")
    val got = Dedup.dupNgramSpans(spanDocs, "doc_id", n = 8, hashGrams = false)
      .orderBy("doc_id")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 12, 5L, 2L, 9L),
      (2L, 12, 5L, 2L, 9L),
      (3L, 12, 5L, 0L, 0L),
      (4L, 3, 0L, 0L, 0L)))
    val hashed = Dedup.dupNgramSpans(spanDocs, "doc_id", n = 8, hashGrams = true)
      .orderBy("doc_id").as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(hashed == got)
  }

  test("dupNgramSpans counts disjoint duplicated spans separately") {
    // shared runs at both ends of doc 1, unique middle => two islands
    val spanDocs = Seq(
      (1L, "a1 a2 a3 a4 a5 m1 m2 m3 m4 b1 b2 b3 b4 b5"),
      (2L, "a1 a2 a3 a4 a5 q1 q2 q3 q4 q5 q6 q7 q8 q9"),
      (3L, "r1 r2 r3 r4 r5 r6 r7 r8 r9 b1 b2 b3 b4 b5")
    ).toDF("doc_id", "text")
    val got = Dedup.dupNgramSpans(spanDocs, "doc_id", n = 5, hashGrams = false)
      .filter($"doc_id" === 1)
      .as[(Long, Int, Long, Long, Long)].head()
    // doc 1: 14 tokens, 10 windows, dup windows at pos 1 (a-run) and pos 10
    // (b-run) => 2 islands, 5 + 5 covered tokens
    assert(got == ((1L, 14, 10L, 2L, 10L)))
  }

  test("exact dedup finds the duplicate group with min-id representative") {
    val groups = Dedup.exact(docs, "doc_id", Seq(md5(col("text")).as("h")))
      .select("keep_id", "group_size").as[(Long, Long)].collect()
    assert(groups.toSeq == Seq((1L, 2L)))
    val kept = Dedup.exactDeduped(docs, "doc_id", md5(col("text")))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash signature: identical texts identical; near-dups mostly agree") {
    val sigs = docs.select(col("doc_id"),
        Dedup.minhashSignature(col("text"), 5, 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } / 64.0
    val agree14 = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b } / 64.0
    assert(agree13 > 0.5, s"near-dup agreement $agree13")
    assert(agree14 < 0.3, s"unrelated agreement $agree14")
  }

  test("minhash LSH surfaces both exact and near duplicate pairs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", minEstJaccard = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), s"pairs=$pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH: null-text docs never pair (null signature propagates)") {
    val withNulls = docs.unionByName(Seq(
      (6L, null.asInstanceOf[String]), (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text"))
    val pairs = Dedup.minhashLsh(withNulls, "doc_id", minEstJaccard = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 >= 6L || p._2 >= 6L), s"pairs=$pairs")
  }

  test("simhash: identical = same signature, near-dup within small hamming") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) <= 16, s"hamming ${ham(sigs(1L), sigs(3L))}")
    assert(ham(sigs(1L), sigs(4L)) > 16)
  }

  test("simhashPairs recall contract: finds exactly the brute-force pair set at maxHamming=8") {
    // 40 docs built from a shared vocabulary so signatures cluster at a
    // range of Hamming distances — exercises pairs well past distance 3
    val vocab = Vector("spark", "catalyst", "shuffle", "broadcast", "partition",
      "codegen", "parquet", "tungsten", "dataset", "encoder", "plan", "stage")
    val rng = new scala.util.Random(7)
    val corpus = (1L to 40L).map { i =>
      (i, (0 until 12).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    val maxHamming = 8
    val got = Dedup.simhashPairs(df, "doc_id", maxHamming = maxHamming)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigs = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    val expected = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= maxHamming
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "test corpus produced no close pairs — not exercising recall")
    assert(expected.exists { case (a, b) => java.lang.Long.bitCount(sigs(a) ^ sigs(b)) > 3 },
      "no pair past distance 3 — the old 4-chunk banding would have passed trivially")
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("simhashPairsPortable matches a Scala reimplementation of the portable signature") {
    // brute-force twin: recompute the md5-derived signature per doc in plain
    // Scala, enumerate all pairs within maxHamming, compare with the
    // banded-join pipeline (recall AND precision)
    val vocab = Vector("spark", "catalyst", "shuffle", "broadcast", "partition",
      "codegen", "parquet", "tungsten", "dataset", "encoder", "plan", "stage")
    val rng = new scala.util.Random(13)
    val corpus = (1L to 40L).map { i =>
      (i, (0 until 12).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sig(text: String): String = {
      val toks = text.trim.toLowerCase.split("\\s+", -1)
      (0 until 64).map { j =>
        val sum = toks.map { w =>
          val v = "0123456789abcdef".indexOf(md5hex(w).charAt(j % 16))
          (((v >> (j >> 4)) & 1) * 2) - 1
        }.sum
        if (sum > 0) '1' else '0'
      }.mkString
    }
    val sigs = corpus.map { case (i, t) => i -> sig(t) }.toMap
    val maxHamming = 3
    val expected = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      if sigs(a).zip(sigs(b)).count { case (x, y) => x != y } <= maxHamming
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "test corpus produced no close pairs — not exercising recall")
    val got = Dedup.simhashPairsPortable(df, "doc_id", maxHamming = maxHamming)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("embedding-cosine near-dup: LSH path finds the exact pair set on clustered vectors") {
    // 3 clusters of near-identical vectors (small jitter) + isolated noise:
    // true near-dups sit at cosine ~0.99, cross-cluster far below
    val rng = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(3)(Array.fill(dim)(rng.nextGaussian()))
    val rows = (0 until 30).map { i =>
      val v =
        if (i < 24) centers(i % 3).map(x => (x + rng.nextGaussian() * 0.01).toFloat)
        else Array.fill(dim)(rng.nextGaussian().toFloat)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")

    val exact = Dedup.cosineNearDupExact(df, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 24 * 7 / 2, s"clusters should be dense, got ${exact.size}")

    val lsh = Dedup.cosineNearDupPairs(df, "vec_id", "embedding", 0.9, dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH can only MISS candidates, never invent them (exact verify step)
    assert((lsh -- exact).isEmpty, s"false positives: ${lsh -- exact}")
    assert(lsh == exact, s"missed pairs: ${exact -- lsh}")
  }

  test("goldenRecords: transitive clusters, survivor order, singleton lineage") {
    val recs = Seq(
      (1L, "alice", 10L), (2L, "alice", 40L), (3L, "alice", 40L),
      (4L, "bob", 7L), (5L, "carol", 99L)
    ).toDF("id", "name", "quality")
    // 1-2 and 2-3 chain into {1,2,3}; 4 pairs with nothing; 5 singleton
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.goldenRecords(recs, "id", pairs,
        survivorOrder = Seq(col("quality").desc, col("id")))
      .select(col("cluster_id"), col("id"), col("n_members"), col("member_ids"))
      .orderBy("cluster_id")
      .as[(Long, Long, Long, Seq[Long])].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 3L, Seq(1L, 2L, 3L)), // survivor 2: quality 40 ties with 3, min id wins
      (4L, 4L, 1L, Seq(4L)),
      (5L, 5L, 1L, Seq(5L))))
  }

  test("ngram jaccard on candidate pairs") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccard(pairs, docs, "doc_id")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 4L)) < 0.2)
  }

  test("semanticDedupExact: transitive chain collapses to min id; singletons keep") {
    // 1~2 and 2~3 are near (cos ~1), 1~3 only via the chain; 4 orthogonal
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.98f, 0.199f)),  // cos(1,2) ≈ 0.98
      (3L, Array(0.92f, 0.392f)),  // cos(2,3) ≈ 0.98, cos(1,3) ≈ 0.92
      (4L, Array(0.0f, 1.0f)),
      (5L, Array(0.0f, 0.0f))      // zero norm: must survive as singleton
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupExact(emb, "vec_id", "embedding", minCosine = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false)))
    assert(out(3L) == ((1L, false)), "chain 1~2~3 must collapse even though cos(1,3) < tau")
    assert(out(4L) == ((4L, true)))
    assert(out(5L) == ((5L, true)))
  }

  test("semanticDedup (celled): drops are a subset of the exact drops") {
    // clustered vectors: the celled path must find within-cluster dups
    val rnd = new scala.util.Random(7)
    val centers = Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0), Array(0, 0, 1.0, 0))
    val emb = (0 until 90).map { i =>
      val c = centers(i % 3)
      val noise = if (i < 45) 0.01 else 0.8 // first half: tight near-dups
      (i.toLong, c.map(x => (x + noise * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = Dedup.semanticDedupExact(emb, "vec_id", "embedding", 0.98)
      .filter(!col("keep")).as[(Long, Long, Boolean)].collect().map(_._1).toSet
    val celled = Dedup.semanticDedup(emb, "vec_id", "embedding",
        dim = 4, minCosine = 0.98, nCells = 3)
      .filter(!col("keep")).as[(Long, Long, Boolean)].collect().map(_._1).toSet
    assert(exact.nonEmpty, "fixture must contain near-dups")
    assert(celled.subsetOf(exact), s"celled=${celled -- exact} outside exact")
    assert(celled.size >= (exact.size * 0.5).toInt,
      s"recall too low: ${celled.size}/${exact.size}")
  }

  test("incremental LSH: new batch against a persisted index = cross pairs of the full self-join") {
    // index the "existing corpus" (odd ids), stream in the even ids
    val existing = docs.filter(col("doc_id") % 2 === 1)
    val fresh = docs.filter(col("doc_id") % 2 === 0)
    val index = Dedup.bandedSignatures(existing, "doc_id")
    val got = Dedup.minhashLshAgainstIndex(fresh, index, "doc_id", minEstJaccard = 0.4)
      .select("new_id", "index_id").as[(Long, Long)].collect().toSet
    // ground truth: cross-subset pairs of the full-corpus self-join
    val full = Dedup.minhashLsh(docs, "doc_id", minEstJaccard = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = full.flatMap { case (a, b) =>
      val cross =
        if (a % 2 == 0 && b % 2 == 1) Some((a, b))
        else if (b % 2 == 0 && a % 2 == 1) Some((b, a))
        else None
      cross
    }
    assert(got == expected, s"got=$got expected=$expected")
    // doc 2 (exact dup of indexed doc 1) must be flagged
    assert(got.contains((2L, 1L)))
  }

  test("setSimilarityJoin: lossless prefix filtering vs brute force, threshold boundary inclusive") {
    // pseudo-random token sets with planted near-dups
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"t$i")
    val base = (1L to 30L).map(i => i -> rnd.shuffle(vocab).take(8 + rnd.nextInt(6)).toSeq)
    val dups = (31L to 40L).map { i =>
      val (srcId, srcToks) = base((i % 30).toInt)
      i -> (srcToks.take(srcToks.size - 1) :+ s"x$i") // high-overlap variant of src
    }
    val df = (base ++ dups).toDF("id", "toks")
    val got = Dedup.setSimilarityJoin(df, "id", "toks", minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force
    val sets = (base ++ dups).map { case (i, ts) => i -> ts.toSet }.toMap
    val expect = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      if inter * 2 >= (sets(a).size + sets(b).size - inter)
    } yield (a, b)).toSet
    assert(expect.nonEmpty, "fixture must produce pairs")
    assert(got == expect, s"only_spark=${got -- expect} only_brute=${expect -- got}")
    // exact boundary: jaccard exactly 0.5 must be INCLUDED (2 shared of sizes 3,3)
    val edge = Seq((1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "d"))).toDF("id", "toks")
    assert(Dedup.setSimilarityJoin(edge, "id", "toks", minJaccard = 0.5).count() == 1L)
  }

  test("setSimilarityJoin: over-full prefix bucket FAILS loudly, never drops silently") {
    // every doc is {hot, uniq_i}: at t=0.5 the prefix is the whole 2-token
    // set, so "hot" lands in every doc's prefix -> one bucket of size 20,
    // over a cap of 5 -> the lossless default must raise, naming the cap
    val hot = (1L to 20L).map(i => (i, Seq("hot", s"uniq$i"))).toDF("id", "toks")
    val ex = intercept[Exception] {
      Dedup.setSimilarityJoin(hot, "id", "toks", minJaccard = 0.5, maxBucketSize = 5)
        .count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("maxBucketSize")),
      s"expected the cap error to surface, got: ${ex.getMessage}")
  }

  test("setSimilarityJoinCounted: drops over-full buckets with an audited count") {
    // hot docs {hot, shared, u_i} are pairwise jaccard 2/4 = 0.5; their
    // 2-token prefixes are [u_i, hot] (rarest-first), so ALL 190 hot pairs
    // flow through the single "hot" bucket (size 20). Cap 5 drops it —
    // the counted variant must lose exactly those pairs, report the loss
    // in the accumulator, and keep the cold exact-dup pair intact.
    val rows = (1L to 20L).map(i => (i, Seq("hot", "shared", s"u$i"))) ++
      Seq((101L, Seq("cold", "alpha")), (102L, Seq("cold", "alpha")))
    val df = rows.toDF("id", "toks")
    val (res, acc) = Dedup.setSimilarityJoinCounted(
      df, "id", "toks", minJaccard = 0.5, maxBucketSize = 5)
    val pairs = res.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(acc.value > 0L, "dropped-entry accumulator must fire on the hot bucket")
    assert(pairs == Set((101L, 102L)),
      s"hot pairs dropped, cold pair kept; got $pairs")
    // with a generous cap the counted variant is exact: all 190 hot pairs
    // plus the cold pair come back and zero drops are counted
    val (resOk, accOk) = Dedup.setSimilarityJoinCounted(
      df, "id", "toks", minJaccard = 0.5)
    assert(resOk.count() == 191L)
    assert(accOk.value == 0L)
  }

  test("sortedNeighborhoodPairs: window candidates match a brute-force positional pairing") {
    // keys chosen so near-dups sort adjacently and a far pair does NOT,
    // proving both the find and the blocking miss are positional
    val rows = Seq(
      (10L, "aaa", Seq("x", "y", "z", "w")),
      (11L, "aab", Seq("x", "y", "z", "q")),      // adjacent near-dup of 10
      (12L, "mmm", Seq("p", "q", "r")),
      (13L, "zzz", Seq("x", "y", "z", "w")),      // IDENTICAL to 10 but sorts far away
      (14L, "mmn", Seq("p", "q", "s"))            // adjacent near-dup of 12
    )
    val df = rows.toDF("id", "bkey", "toks")
    val got = Dedup.sortedNeighborhoodPairs(df, "id", col("bkey"), "toks",
        window = 2, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force: sort by (bkey, id), pair only adjacent positions, Jaccard >= 0.5
    val order = rows.sortBy(r => (r._2, r._1)).map(r => (r._1, r._3.toSet))
    val expect = order.sliding(2).collect {
      case Seq((ia, ta), (ib, tb))
        if (ta & tb).size * 2 >= (ta.size + tb.size - (ta & tb).size) =>
        (math.min(ia, ib), math.max(ia, ib))
    }.toSet
    assert(expect == Set((10L, 11L), (12L, 14L)), s"fixture expectation drifted: $expect")
    assert(got == expect, s"only_spark=${got -- expect} only_brute=${expect -- got}")
    // widening the window to cover the whole corpus must surface the far
    // identical pair too (blocking recall is a function of w, not similarity)
    val gotWide = Dedup.sortedNeighborhoodPairs(df, "id", col("bkey"), "toks",
        window = 5, minJaccard = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(gotWide.contains((10L, 13L)))
  }

  test("winnowKeys: selection matches a brute-force winnow; rightmost tie rule") {
    val s = "abcabcabcabcxyzq"  // repeated structure forces equal gram hashes
    val k = 4; val w = 3
    val got = graft.llm.TextKernels
      .winnowKeys(org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
      .toLongArray().toSeq
    // brute force: same hash, same key encoding, min per window, distinct
    val M = 2147483647L
    val g = s.length - k + 1
    val keys = (0 until g).map { i =>
      val h = (0 until k).foldLeft(42L)((a, j) => (a * 31L + s.charAt(i + j)) % M)
      h * 2097152L + (1048576L - (i + 1))
    }
    val expect = (w - 1 until g).map(e => (e - w + 1 to e).map(keys).min).distinct.sorted
    assert(got == expect)
    // equal gram hashes within a window: the encoding makes the larger pos win
    val hEq = keys.map(_ >> 21)
    assert(hEq(0) == hEq(3) && hEq(0) == hEq(6), "abca gram repeats every 3")
  }

  test("winnowPairs guarantees a hit for shared runs >= w+k-1 chars and skips unrelated docs") {
    val a = "The Catalyst optimizer rewrites logical plans before physical planning begins."
    // doc 2 embeds a long verbatim run of doc 1 inside unrelated text
    val wdocs = Seq(
      (1L, a),
      (2L, "Unrelated preamble here. the catalyst OPTIMIZER rewrites logical plans wholly new tail."),
      (3L, "Entirely different sentence about parquet row groups and column statistics pruning."),
      (4L, "short")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(wdocs, "doc_id", k = 16, w = 4, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"shared 40+ char run must be detected, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"doc 3 unrelated, got $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "doc shorter than k+w-1 yields no fingerprints")
    // determinism
    val again = Dedup.winnowPairs(wdocs, "doc_id", k = 16, w = 4, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(again == pairs)
  }

  test("removeDuplicateSpans: later occurrences removed, first kept, text reassembled") {
    // chunk size 2: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [c d]
    // -> doc 2 loses "a b" (doc 1 idx 0 is first), doc 3 loses "c d"
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "c d")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", chunkTokens = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a b c d", 2L, 0L),
      (2L, "x y", 2L, 1L),
      (3L, "", 1L, 1L)))
  }

  test("removeDuplicateSpans: within-doc repeats collapse to the first occurrence") {
    val docs = Seq((7L, "a b a b a b")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", chunkTokens = 2)
      .as[(Long, String, Long, Long)].head()
    assert(out == ((7L, "a b", 3L, 2L)))
  }

  test("stripBoilerplateSpans: high-df chunks vanish everywhere, low-df survive") {
    // "nav bar" appears in 3 docs (df=3 >= 3 -> stripped from ALL),
    // "a b" in 2 docs (df=2 -> kept everywhere)
    val docs = Seq(
      (1L, "nav bar a b"), (2L, "nav bar a b"), (3L, "nav bar c c")
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateSpans(docs, "doc_id",
        chunkTokens = 2, minDocFrequency = 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a b", 2L, 1L),
      (2L, "a b", 2L, 1L),
      (3L, "c c", 2L, 1L)))
  }

  test("linkageScores: hand-computed agreement vectors, scores, and decisions") {
    import Dedup.LinkageRule
    val recs = Seq(
      (1L, "srcA", 100L), (2L, "srcA", 103L), (3L, "srcB", 250L)
    ).toDF("id", "src", "nc")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.linkageScores(pairs, recs, "id", Seq(
        LinkageRule("same_src", col("src_a") === col("src_b"), 10L, -4L),
        LinkageRule("close_nc", abs(col("nc_a") - col("nc_b")) <= 5, 5L, -2L)),
        upperThreshold = 12L, lowerThreshold = 0L)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Int, Int, Long, String)].collect().toSeq
    // (1,2): both agree -> 15, link; (1,3): both disagree -> -6, non-link
    assert(out == Seq(
      (1L, 2L, 1, 1, 15L, "link"),
      (1L, 3L, 0, 0, -6L, "non-link")))
  }

  test("linkageScores: possible band sits strictly between the thresholds") {
    import Dedup.LinkageRule
    val recs = Seq((1L, "x"), (2L, "x")).toDF("id", "src")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    def run(w: Long) = Dedup.linkageScores(pairs, recs, "id",
        Seq(LinkageRule("s", col("src_a") === col("src_b"), w, -1L)),
        upperThreshold = 10L, lowerThreshold = 0L)
      .select("decision").as[String].head()
    assert(run(10L) == "link")     // == upper -> link
    assert(run(5L) == "possible")  // between
    assert(run(0L) == "non-link")  // == lower -> non-link
  }

  test("sourceShingleContainment: asymmetric containment, subset corpus scores 1.0") {
    // source "small" has grams {a b, b c} (from "a b c"); source "big"
    // has those plus more ("a b c d e" -> {a b, b c, c d, d e})
    val docs = Seq(
      ("small", "a b c"), ("big", "a b c d e")
    ).toDF("source", "text")
    val out = Dedup.sourceShingleContainment(docs, "source")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("big", "small", 2L, 4L, 0.5),
      ("small", "big", 2L, 2L, 1.0)))
  }

  test("sourceShingleContainment: duplicate grams within a source count once") {
    val docs = Seq(
      ("s1", "a b a b"), ("s1", "a b"), ("s2", "a b x")
    ).toDF("source", "text")
    val out = Dedup.sourceShingleContainment(docs, "source")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // s1 grams: {a b, b a}; s2 grams: {a b, b x}; common = {a b}
    assert(out == Seq(
      ("s1", "s2", 1L, 2L, 0.5),
      ("s2", "s1", 1L, 2L, 0.5)))
  }

  test("pairMetrics: canonicalization + hand-computed precision/recall") {
    // candidates {1-2 (twice, reversed), 3-4, 5-5 self}; truth {1-2, 4-3, 7-8}
    val cand = Seq((1L, 2L), (2L, 1L), (3L, 4L), (5L, 5L)).toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (4L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val m = Dedup.pairMetrics(cand, truth)
      .as[(Long, Long, Long, Double, Double)].head()
    // canon candidates = {1-2, 3-4}; tp=2, fp=0, fn=1 (7-8)
    assert(m == ((2L, 0L, 1L, 1.0, 2.0 / 3.0)))
  }

  test("pairMetrics on a real blocking: LSH candidates vs brute-force truth") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "totally different content here now"),
      (4L, "alpha beta gamma delta epsilon eta")   // near-dup of 1/2
    ).toDF("doc_id", "text")
    val cand = Dedup.minhashLsh(docs, "doc_id", minEstJaccard = 0.5)
      .select("id_a", "id_b")
    val truth = Seq((1L, 2L), (1L, 4L), (2L, 4L)).toDF("id_a", "id_b")
    val m = Dedup.pairMetrics(cand, truth)
      .as[(Long, Long, Long, Double, Double)].head()
    // exact dup pair must be found; no false positives against doc 3
    assert(m._2 == 0L && m._1 >= 1L)
  }

  test("span chunking: partial tail chunk is kept and deduped as its own unit") {
    // 5 tokens at chunk size 2 -> chunks [a b][c d][e]; doc 2's lone "e"
    // matches doc 1's tail chunk exactly
    val docs = Seq((1L, "a b c d e"), (2L, "e")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", chunkTokens = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "a b c d e", 3L, 0L), (2L, "", 1L, 1L)))
  }

  test("readSignatureIndex: excludeBatch keeps legacy batch-less rows and applies on mixed files") {
    // a pre-upgrade index has files WITHOUT the batch column; after an
    // upgrade new appends carry it. The replay exclusion must (a) still
    // apply at all — parquet footer sampling without mergeSchema can hide
    // the column entirely — and (b) keep the legacy rows, which read as
    // batch=NULL and would vanish from EVERY probe under a null-rejecting
    // =!= (silently missed corpus duplicates).
    val root = java.nio.file.Files.createTempDirectory("graft-legacy-idx").toString
    val sigs = Dedup.bandedSignatures(
      Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "doc_id", "text")
    // legacy layout: same pfx= partitioning, NO batch column
    sigs.withColumn("pfx", Dedup.indexPrefix(col("bucket")))
      .write.mode("append").partitionBy("pfx").parquet(s"$root/idx")
    // post-upgrade appends from two microbatches
    Dedup.writeSignatureIndex(Dedup.bandedSignatures(
      Seq((2L, "one two three four five six")).toDF("doc_id", "text"),
      "doc_id", "text"), s"$root/idx", batchId = 7L)
    Dedup.writeSignatureIndex(Dedup.bandedSignatures(
      Seq((3L, "sept huit neuf dix onze douze")).toDF("doc_id", "text"),
      "doc_id", "text"), s"$root/idx", batchId = 8L)
    val allPfx = (0 until Dedup.IndexBucketPrefixes).toSeq
    val ids = (b: Option[Long]) =>
      Dedup.readSignatureIndex(spark, s"$root/idx", allPfx, b)
        .select("id").distinct().as[Long].collect().toSet
    assert(ids(None) == Set(1L, 2L, 3L))
    // replaying batch 7 excludes ONLY its own rows — doc 1 (legacy, NULL
    // batch) and doc 8's rows stay probe-visible
    assert(ids(Some(7L)) == Set(1L, 3L),
      "excludeBatch must keep legacy NULL-batch rows and other batches")
  }
}
