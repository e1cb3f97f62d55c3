package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("quality metrics on a known sentence") {
    val df = Seq((1L, "The quick, brown fox! It was fast.")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityMetrics(df).head()
    assert(r.getAs[Int]("n_chars_computed") == 34)
    assert(r.getAs[Int]("n_tokens") == 7)
    // punctuation: , ! . -> 3 of 34
    assert(math.abs(r.getAs[Double]("punct_ratio") - 3.0 / 34) < 1e-9)
    // stopwords (en list): the, it, was -> 3 of 7
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 3.0 / 7) < 1e-9)
  }

  test("bpe-ish token count splits punctuation") {
    val df = Seq((1L, "don't stop, now!")).toDF("doc_id", "text")
    val n = df.select(TextAnalysis.bpeishTokenCount($"text").as("n")).as[Int].head()
    // don ' t stop , now ! -> 7
    assert(n == 7, s"got $n")
  }

  test("language id picks the stopword-dominant language") {
    val df = Seq(
      (1L, "the cat and the dog are in the house"),
      (2L, "el perro y la casa de los gatos en la calle"),
      (3L, "zzz qqq xxx")).toDF("doc_id", "text")
    val out = TextAnalysis.withLangId(df).select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("en"))
    assert(out(2L).contains("es"))
    assert(out(3L).isEmpty)
  }

  test("language id resolves hit-count ties to null (und)") {
    // "en un" scores 2 for both es (en, un) and fr (en, un) — ambiguous
    val df = Seq((1L, "en un")).toDF("doc_id", "text")
    val out = TextAnalysis.withLangId(df).select("lang_pred").head()
    assert(out.isNullAt(0), s"tie must yield null, got ${out.get(0)}")
  }

  test("fingerprint is whitespace-normalized and order-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha   beta\tgamma"),
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    val fp = TextAnalysis.withFingerprint(df).select("doc_id", "fingerprint")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L)) // whitespace-invariant
    assert(fp(1L) != fp(3L)) // order-sensitive
  }

  test("fingerprintPortable matches a Scala reimplementation of the fold, incl. non-ASCII") {
    val M = 2147483647L
    def fold(text: String): Long = {
      val toks = text.trim.toLowerCase.split("\\s+", -1)
      toks.foldLeft(7L) { (a, w) =>
        val h = w.codePoints().toArray.foldLeft(42L)((x, c) => (x * 31 + c) % M)
        (a * 37 + h) % M
      }
    }
    val rows = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha   beta\tgamma"),
      (3L, "gamma beta alpha"), (4L, ""), (5L, "café über niño"))
    val df = rows.toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
        TextAnalysis.fingerprintPortable(col("text")).as("f"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, t) =>
      assert(fp(id) == fold(t), s"doc $id: got ${fp(id)}, expected ${fold(t)}")
    }
    assert(fp(1L) == fp(2L)) // whitespace-invariant
    assert(fp(1L) != fp(3L)) // order-sensitive
  }

  test("repetition metrics match hand-computed ratios") {
    val df = Seq(
      (1L, "a b a b a"),          // toks 5, distinct 2; 2grams: ab ba ab ba -> 2/4 distinct
      (2L, "x y z"),              // no repetition
      (3L, "w w w w")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(df)
      .select("doc_id", "dup_word_ratio", "dup_2gram_ratio", "top_token_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((1.0 - 2.0 / 5, 1.0 - 2.0 / 4, 3.0 / 5)))
    assert(out(2L) == ((0.0, 0.0, 1.0 / 3)))
    assert(out(3L) == ((1.0 - 1.0 / 4, 1.0 - 1.0 / 3, 1.0)))
  }

  test("native ws_token_count matches the regex split count on edge cases") {
    val cases = Seq("", " ", "\t\n", "a", " a ", "a b", "a  b\tc\nd",
      "\u00e9l\u00e9phant caf\u00e9", "multi\u000bvertical", "x " * 50)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.wsTokenCount(col("text")).as("native"),
        size(split(trim(lower(col("text"))), "\\s+")).as("regex"))
      .collect()
    for (r <- out)
      assert(r.getInt(1) == r.getInt(2), s"case ${r.getLong(0)}: ${r.getInt(1)} vs ${r.getInt(2)}")
  }

  test("tfidf top-k: hand-computed scores, per-doc k, term tie-break") {
    // N=4. "rare" occurs in 1 doc, "mid" in 2, "common" in all 4.
    val df = Seq(
      (1L, "common rare rare mid"),
      (2L, "common mid"),
      (3L, "common common"),
      (4L, "common")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(df, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 1: rare tf=2 df=1 -> 2*ln(4); mid tf=1 df=2 -> ln(2); common cut at k=2
    assert(out((1L, "rare")) == ((2L, 1L, 2 * math.log(4.0))))
    assert(out((1L, "mid")) == ((1L, 2L, math.log(2.0))))
    assert(!out.contains((1L, "common")))
    // doc 3: only "common" (tf=2, df=4, score 0) — fewer than k rows is fine
    assert(out((3L, "common")) == ((2L, 4L, 0.0)))
    assert(out.count(_._1._1 == 3L) == 1)
    // doc 2: both terms kept; common (score 0) ranks below mid (ln 2)
    assert(out((2L, "mid"))._3 > out((2L, "common"))._3)
  }

  test("native simhash64: identical for same tokens, distant for different text") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha   beta\tgamma"),
      (3L, "totally unrelated words entirely elsewhere")).toDF("doc_id", "text")
    val sig = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L), "whitespace-invariant")
    val hamming = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    assert(hamming > 10, s"unrelated texts must be distant, hamming=$hamming")
  }

  test("bm25TopK matches a hand-computed score ranking") {
    // 3 docs, 1 query: "cat dog". df(cat)=2, df(dog)=1. doc 30 has no
    // query term and must be absent; doc 20 (cat + dog) outranks doc 10
    // (cat cat) because dog's idf dwarfs the extra cat tf.
    val docs = Seq((10L, "cat cat fish"), (20L, "cat dog bird"),
      (30L, "fish bird bird")).toDF("doc_id", "text")
    val qs = Seq(("q", Seq("cat", "dog"))).toDF("query_id", "terms")
    val out = TextAnalysis.bm25TopK(docs, qs, k = 3)
      .orderBy("rank")
      .select("doc_id", "tf_sum", "dl", "bm25")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(20L, 10L))
    assert(out(0)._2 == 2L && out(0)._3 == 3L) // cat+dog tf, doclen
    // closed-form check of doc 20's score (k1=1.25, b=0.75, avgdl=3 -> the
    // length normalizer is exactly 1): per term tf=1 -> s = idf * 2.25/2.25
    val idf = (df: Double) => math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    assert(math.abs(out(0)._4 - (idf(2) + idf(1))) < 1e-12)
  }

  test("bigramLmScore: uniform doc scores lower nll than a shuffled one") {
    // model trained on both docs; doc 1 is a repeated high-count bigram,
    // doc 2 contains transitions seen only once
    val docs = Seq((1L, "a b a b a b a b"), (2L, "b b a a b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs)
      .select("doc_id", "n_bigrams", "avg_nll")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == 7L && out(2L)._1 == 4L)
    assert(out(1L)._2 < out(2L)._2, s"repetitive doc must score lower nll: $out")
    // hand-check doc 2 exactly. Corpus bigram counts: (a,b)=5, (b,a)=4,
    // (b,b)=1, (a,a)=1; histories c1(a)=6, c1(b)=5; V=2.
    // doc 2's bigrams in order: (b,b), (b,a), (a,a), (a,b).
    val pB_givenB = math.log(2.0 / 7.0) // (1+1)/(5+2)
    val pA_givenB = math.log(5.0 / 7.0) // (4+1)/(5+2)
    val pA_givenA = math.log(2.0 / 8.0) // (1+1)/(6+2)
    val pB_givenA = math.log(6.0 / 8.0) // (5+1)/(6+2)
    val exact2 = -(pB_givenB + pA_givenB + pA_givenA + pB_givenA) / 4.0
    assert(math.abs(out(2L)._2 - exact2) < 1e-12, s"got ${out(2L)._2}, want $exact2")
  }

  test("jensenShannon: 0 for identical distributions, ln 2 for disjoint vocabularies") {
    import spark.implicits._
    // s1 and s2 identical (JSD 0); s3 disjoint from both (JSD ln 2)
    val counts = Seq(
      ("s1", "a", 2L), ("s1", "b", 1L),
      ("s2", "a", 2L), ("s2", "b", 1L),
      ("s3", "x", 5L)
    ).toDF("source", "w", "c")
    val out = TextAnalysis.jensenShannon(counts)
      .as[(String, String, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(out(("s1", "s2")) == ((2L, 0.0)))
    assert(out(("s1", "s3")) == ((0L, 0.6931))) // round(ln 2, 4)
    assert(out(("s2", "s3")) == ((0L, 0.6931)))
    // the pair grid is |groups|²: past maxGroups it must LOUD-fail
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.jensenShannon(counts, maxGroups = 2).count()
    }
    assert(e.getMessage.contains("maxGroups"), e.getMessage)
  }

  test("jensenShannon: hand-computed asymmetric-overlap pair") {
    import spark.implicits._
    // P = {a: 1}, Q = {a: 1/2, b: 1/2}
    // m(a) = 3/4, m(b) = 1/4
    // JSD = 1/2·[1·ln(4/3)] + 1/2·[1/2·ln(2/3) + 1/2·ln(2)]
    val counts = Seq(("p", "a", 4L), ("q", "a", 2L), ("q", "b", 2L))
      .toDF("source", "w", "c")
    val expect = BigDecimal(
        0.5 * math.log(4.0 / 3.0) + 0.25 * math.log(2.0 / 3.0) + 0.25 * math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = TextAnalysis.jensenShannon(counts)
      .as[(String, String, Long, Double)].head()
    assert(out._1 == "p" && out._2 == "q" && out._3 == 1L)
    assert(math.abs(out._4 - expect) < 1e-9, s"got ${out._4}, want $expect")
  }

  test("normalizeText: NFC, accent strip, casefold, whitespace collapse") {
    val rows = Seq(
      (1L, "Café  du  Monde"),   // combining acute
      (2L, "Ángel Ñoño"), // precomposed accents
      (3L, "ZÜRICH\tnaïve côte"),
      (4L, "  Façade år  "),
      (5L, "plain ascii text"),
      (6L, ""),
      (7L, "ß stays")              // sharp s is not an accent
    ).toDF("id", "text")
    val out = rows.select($"id",
        TextAnalysis.normalizeText($"text").as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "cafe du monde")
    assert(out(2L) == "angel nono")
    assert(out(3L) == "zurich naive cote")
    assert(out(4L) == "facade ar")
    assert(out(5L) == "plain ascii text")
    assert(out(6L) == "")
    assert(out(7L) == "ß stays")
    // null-safe
    val withNull = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(TextAnalysis.normalizeText($"text").as("n"))
    assert(withNull.head().isNullAt(0))
  }

  test("jaroWinkler: canonical literature values, boost gate, floor-halved transpositions") {
    val pairs = Seq(
      ("martha", "marhta", 0.9611),   // boost: l=3
      ("dwayne", "duane", 0.84),      // boost: l=1
      ("dixon", "dicksonx", 0.8133),  // boost: l=2
      ("aXXXX", "aYYYY", 0.4667),     // jaro <= 0.7: NO boost despite prefix
      ("ab", "ba", 0.0),              // window 0 excludes the cross match
      ("", "abc", 0.0), ("", "", 0.0),
      ("abc", "abc", 1.0),
      // odd raw transposition count: the floor (not /2.0) convention
      ("key agg row ", "merge merge ", 0.5556)
    ).toDF("a", "b", "expect")
    val got = pairs.select($"a", $"b", $"expect",
        round(TextAnalysis.jaroWinkler($"a", $"b"), 4).as("jw"))
      .as[(String, String, Double, Double)].collect()
    got.foreach { case (a, b, e, j) =>
      assert(j == e, s"jw('$a','$b') = $j, want $e")
    }
  }

  test("two-level md5-bucketed fold matches the single whole-vocab fold at the ROUND(,4) contract") {
    import spark.implicits._
    // 5k distinct tokens across 3 sources, counts 1..7: large enough that
    // tokens land in many distinct md5 buckets, so the two-level
    // re-association actually exercises a different IEEE add order than
    // one flat ascending-token fold.
    val counts = (0 until 5000).flatMap { i =>
      val w = f"tok$i%05d"
      Seq(("a", w, (i % 7 + 1).toLong)) ++
        (if (i % 2 == 0) Seq(("b", w, (i % 5 + 1).toLong)) else Nil) ++
        (if (i % 3 == 0) Seq(("c", w, (i % 3 + 1).toLong)) else Nil)
    }.toDF("source", "w", "c")
    // single-fold reference, computed exactly as the pre-round-8 engine
    // did: one ascending-token ordered fold over the whole vocabulary
    val totals = counts.groupBy("source")
      .agg(sum($"c").as("n_tokens"))
    val p = $"c".cast("double") / $"n_tokens"
    val single = counts.join(totals, "source")
      .select($"source", $"w", (-p * log(p)).as("term"))
      .groupBy("source")
      .agg(aggregate(sort_array(collect_list(struct($"w", $"term"))),
        lit(0.0), (a, x) => a + x.getField("term")).as("h"))
      .select($"source", round($"h", 4).as("entropy"))
      .as[(String, Double)].collect().toMap
    val twoLevel = TextAnalysis.unigramEntropy(counts)
      .select($"source", $"entropy").as[(String, Double)].collect().toMap
    assert(twoLevel == single,
      s"two-level fold must agree with the single fold at 4 dp: $twoLevel vs $single")
  }
  test("gopherRules: every reason fires, first-failure order, integer thresholds") {
    import spark.implicits._
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val docs = Seq(
      mk(1L, Seq.fill(30)("word") ++ Seq("the", "a")),            // repetition (32×8 > 32? 30·8>32 ✓)
      mk(2L, Seq("the", "a", "cat")),                             // too_short
      mk(3L, Seq.fill(40)("x" * 9) ++ Seq("the", "a")),           // word_len (mean > 7)
      mk(4L, (1 to 30).map(i => f"word$i%02d") :+ "the"),         // stopwords (only 1 distinct)
      mk(5L, Seq.fill(80)("word") ++ Seq("the", "a")),            // too_long
      // accepted: 28 distinct 4-char words + the + a + of, top_cnt 1, 8*1 <= 31
      mk(6L, (1 to 28).map(i => f"w$i%03d") ++ Seq("the", "a", "of"))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs)
      .select("doc_id", "reason", "accepted")
      .as[(Long, String, Boolean)].collect()
      .map { case (k, v, a) => k -> ((v, a)) }.toMap
    assert(got(1L) == ("repetition", false), got.toString)
    assert(got(2L) == ("too_short", false))
    assert(got(3L) == ("word_len", false))
    assert(got(4L) == ("stopwords", false))
    assert(got(5L) == ("too_long", false))
    assert(got(6L) == ("ok", true))
    // first-failure order: doc 2 is ALSO stopword-poor and repetitious,
    // but too_short is checked first
  }

  test("kneserNeyBigram: hand-computed discount + continuation backoff") {
    import spark.implicits._
    // tokens a b a b a c -> bigrams ab, ba, ab, ba, ac
    // c12: ab=2 ba=2 ac=1; types=3; c1(a)=3 n1fw(a)=2; c1(b)=2 n1fw(b)=1
    // n1pw: a=1 b=1 c=1
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyBigram(docs, "text")
      .select("w1", "w2", "p_kn").as[(String, String, Double)]
      .collect().map { case (a, b, p) => (a, b) -> p }.toMap
    val pba = (2.0 - 0.75) / 3.0 + ((0.75 * 2) / 3.0) * (1.0 / 3.0)
    val pca = (1.0 - 0.75) / 3.0 + ((0.75 * 2) / 3.0) * (1.0 / 3.0)
    val pab = (2.0 - 0.75) / 2.0 + ((0.75 * 1) / 2.0) * (1.0 / 3.0)
    assert(got(("a", "b")) == pba, got.toString)
    assert(got(("a", "c")) == pca)
    assert(got(("b", "a")) == pab)
    // probabilities are proper: in (0, 1), and the discounted mass is
    // strictly below the MLE estimate for seen bigrams
    assert(got.values.forall(p => p > 0 && p < 1))
    assert(got(("a", "b")) < 2.0 / 3.0 + 0.26, "backoff mass bounded")
    intercept[IllegalArgumentException] {
      TextAnalysis.kneserNeyBigram(docs, "text", discount = 1.5)
    }
  }

  test("oddsRatioClassifier: planted keyword weights, integer scores, df floor") {
    import spark.implicits._
    // 12 labeled docs: "fresh" appears only in positives, "spam" only in
    // negatives, "filler" in both (balanced -> weight 0); "rare" appears
    // in 2 docs only (below minDf=4 -> excluded from the model)
    val labeled = ((0 until 6).map(i => (i.toLong, s"fresh filler x$i", true)) ++
      (6 until 8).map(i => (i.toLong, s"spam filler rare x$i", true)) ++
      (8 until 12).map(i => (i.toLong, s"spam filler x$i", false)))
      .toDF("doc_id", "text", "label")
    // labels: 0..5 pos via fresh; 6,7 pos; 8..11 neg
    val test = Seq(
      (100L, "fresh filler"),   // +1 + 0 = 1 -> predicted
      (101L, "spam filler"),    // spam: df_pos=2, df_neg=4 -> (5)(10) vs 2(3)(10): 50 < 60 -> -1
      (102L, "filler"),         // 0
      (103L, "rare fresh"),     // rare excluded -> +1
      (104L, "unseen words")    // no model tokens -> 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.oddsRatioClassifier(labeled, test, minDf = 4)
      .select("doc_id", "score", "predicted").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // weights: n_pos=8, n_neg=4. fresh: df=(6,0) -> 7*6=42 > 2*1*10=20 -> +1
    // spam: df=(2,4) -> +1? 3*6=18 > 2*5*10=100? no; -1? 5*10=50 > 2*3*6=36 -> -1
    // filler: df=(8,4) -> 9*6=54 > 2*5*10=100? no; 5*10=50 > 2*9*6=108? no -> 0
    assert(got(100L) == ((1L, true)))
    assert(got(101L) == ((-1L, false)))
    assert(got(102L) == ((0L, false)))
    assert(got(103L) == ((1L, true)))
    assert(got(104L) == ((0L, false)))
  }
}
