package graft.ops

import graft.SparkSpec
import graft.geo.Geo
import graft.pipeline.{Constants, ImpactPipeline, SyntheticScenario}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}

/**
 * Property tests (ScalaCheck driven manually — FIXTURES.md pyramid):
 * invariants that must hold for ANY envelope/tile configuration.
 */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def run(prop: Prop, tests: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(tests).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val boxGen: Gen[(Double, Double, Double, Double)] = for {
    x <- Gen.choose(-5.0, 5.0); y <- Gen.choose(-5.0, 5.0)
    w <- Gen.choose(0.1, 3.0); h <- Gen.choose(0.1, 3.0)
  } yield (x, y, x + w, y + h)

  test("probability in [0,1] and = count/51 for any envelope set") {
    val tiles = Seq(("T", Geo.toWkb(Geo.box(0, 0, 1, 1)))).toDF("tile_id", "geometry")
    val envGen = Gen.listOfN(12, for {
      b <- boxGen; th <- Gen.oneOf(Constants.WindThresholds)
    } yield (th, b))
    run(Prop.forAll(envGen) { envs =>
      val envDf = envs.zipWithIndex.map { case ((th, (a, b, c, d)), i) =>
        (i, th, Geo.toWkb(Geo.box(a, b, c, d)))
      }.toDF("ensemble_member", "wind_threshold", "geometry")
      val out = SpatialJoin.probabilityByThreshold(tiles, "geometry", envDf, "geometry",
        keepZeroRows = true).select("wind_threshold", "n_members", "probability").collect()
      out.forall { r =>
        val n = r.getInt(1); val p = r.getDouble(2)
        p >= 0 && p <= 1 && math.abs(p - n / 51.0) < 1e-12 &&
          n <= envs.count(_._1 == r.getInt(0))
      }
    }, tests = 15)
  }

  test("admin rollup conserves sums for any tile->admin assignment") {
    val rng = new scala.util.Random(11)
    val tiles = (1 to 60).map(i =>
      (s"t$i", s"A${rng.nextInt(5)}", rng.nextDouble() * 100)).toDF("tile_id", "id", "population")
    val rolled = Aggregations.adminRollup(tiles.drop("tile_id"), "id")
    val a = tiles.agg(sum("population")).as[Double].head()
    val b = rolled.agg(sum("population")).as[Double].head()
    assert(math.abs(a - b) < 1e-9)
  }

  test("CCI telescoping: sum of indicator bands = [p_min > 0] for any probabilities") {
    val pGen = Gen.listOfN(5, Gen.oneOf(0.0, 0.1, 0.5, 1.0))
    run(Prop.forAll(pGen) { ps =>
      // bands b_i = ind_i - ind_{i+1} (last unsubtracted) telescope to ind_1
      val ind = ps.map(p => if (p > 0) 1.0 else 0.0)
      val bands = ind.zipAll(ind.drop(1), 0.0, 0.0).map { case (a, b) => a - b }
      math.abs(bands.sum - ind.head) < 1e-12
    })
  }

  test("sum(E_x) <= sum(x) per threshold for any scenario slice") {
    val tiles = SyntheticScenario.tiles(spark, nx = 8, ny = 8)
    val envs = SyntheticScenario.envelopes(spark, members = 17)
    val tv = ImpactPipeline.tileView(tiles, envs)
    val e = tv.groupBy("wind_threshold").agg(sum("E_population").as("e"))
    val x = tiles.agg(sum("population").as("x")).as[Double].head()
    assert(e.filter(col("e") > x + 1e-6).count() == 0)
  }

  test("salted aggregation equals plain aggregation (any salt count)") {
    val df = (1 to 500).map(i => (s"k${i % 7}", i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("count"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    Seq(2, 16, 64).foreach { salts =>
      val salted = Skew.saltedSumCount(df, Seq("k"), "v", salts)
        .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      assert(salted.toSeq == plain.toSeq, s"salts=$salts")
    }
  }

  // --- temporal operators: random-data equivalence with brute force -------

  private val eventsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(80, for {
      k <- Gen.choose(1L, 5L); t <- Gen.choose(0L, 2000L); id <- Gen.choose(0L, 1000000L)
    } yield (k, t, id)).map(_.distinctBy(e => (e._1, e._3)))

  test("asofJoin equals per-row brute-force latest-predecessor for any data") {
    run(Prop.forAll(eventsGen, eventsGen) { (ls, rs) =>
      val left = ls.toDF("k", "t", "lid").withColumn("lts", timestamp_micros(col("t"))).drop("t")
      val right = rs.toDF("k", "t", "rid").withColumn("rts", timestamp_micros(col("t"))).drop("t")
      val got = Deltas.asofJoin(left, right, Seq("k"), "lts", "rts",
          payload = Seq("rid"), tieBreak = Some("rid"))
        .select(col("k"), col("lid"), col("asof_rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
      ls.forall { case (k, t, lid) =>
        val cands = rs.filter(r => r._1 == k && r._2 <= t)
        val want = if (cands.isEmpty) None
          else Some(cands.maxBy(r => (r._2, r._3))._3)
        got((k, lid)) == want
      }
    }, tests = 8)
  }

  test("binnedIntervalJoin equals the brute-force inequality join for any bin width") {
    val widthGen = Gen.oneOf(1L, 7L, 50L, 400L, 5000L)
    run(Prop.forAll(eventsGen, eventsGen, widthGen) { (ivs, pts, w) =>
      val iv = ivs.toDF("k", "lo0", "ivid")
        .withColumn("lo", col("lo0")).withColumn("hi", col("lo0") + 150L).drop("lo0")
      val pt = pts.toDF("k", "t", "ptid")
      val got = RangeJoin.binnedIntervalJoin(iv, "lo", "hi", pt, "t", Seq("k"), binWidth = w)
        .select("ivid", "ptid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (ik, it, iid) <- ivs
        (pk, ptt, pid) <- pts
        if ik == pk && ptt >= it && ptt <= it + 150L
      } yield (iid, pid)).toSet
      got == brute
    }, tests = 8)
  }

  test("sessionize partitions events exactly; gaps within sessions never exceed the gap") {
    run(Prop.forAll(eventsGen, Gen.oneOf(10L, 100L, 500L)) { (es, gapMs) =>
      val df = es.toDF("k", "t", "id").withColumn("ts", timestamp_micros(col("t")))
      val out = Sessionize.withSessionSeq(df, Seq("k"), "ts", gapMicros = gapMs,
          tieBreak = Seq(col("id")))
        .select("k", "t", "session_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out.length == es.length && out.groupBy(_._1).values.forall { g =>
        val byT = g.sortBy(x => (x._2, x._3)).toList
        // consecutive events: same session iff gap <= gapMs
        byT.sliding(2).forall {
          case Seq((_, t1, s1), (_, t2, s2)) =>
            if (t2 - t1 <= gapMs) s1 == s2 else s2 == s1 + 1
          case _ => true
        }
      }
    }, tests = 8)
  }

  // --- SCD2 laws (q69/s19's correctness argument, property-checked) ---

  private val scd2ChangesGen: Gen[List[(Long, Long, Long, String)]] =
    Gen.listOfN(14, for {
      k <- Gen.choose(1L, 3L); v <- Gen.choose(0L, 99L)
      ts <- Gen.choose(1L, 40L)
      op <- Gen.frequency(3 -> Gen.const("U"), 1 -> Gen.const("D"))
    } yield (k, v, ts, op)).map(
      // contract: (k, ts) unique — keep the first of each collision
      _.groupBy(c => (c._1, c._3)).values.map(_.head).toList)

  test("SCD2: per-key validity intervals chain disjointly for any change set") {
    run(Prop.forAll(scd2ChangesGen) { chs =>
      val base = Seq((1L, 0L, 0L, Option.empty[Long]), (2L, 0L, 0L, Option.empty[Long]))
        .toDF("k", "v", "valid_from", "valid_to")
      val out = Cdc.applyChangesetScd2(base,
          chs.toDF("k", "v", "ts", "op"), Seq("k"), Seq("v"), "ts", "op")
        .as[(Long, Long, Long, Option[Long], Boolean)].collect()
      out.groupBy(_._1).forall { case (_, vs) =>
        val sorted = vs.sortBy(_._3)
        // chained: each closed version ends exactly where a successor or a
        // delete begins (valid_to >= own valid_from always)
        sorted.forall(v => v._4.forall(_ >= v._3)) &&
          // at most one live version per key, and it is the LAST interval
          sorted.count(_._4.isEmpty) <= 1 &&
          sorted.dropRight(1).forall(_._4.nonEmpty) &&
          // disjoint + ordered: next opens no earlier than previous closes
          sorted.sliding(2).forall {
            case Array(a, b) => a._4.forall(_ <= b._3)
            case _ => true
          }
      }
    }, tests = 30)
  }

  test("SCD2: any time-split of the changes converges to the one-shot history") {
    run(Prop.forAll(scd2ChangesGen, Gen.choose(5L, 35L)) { (chs, cut) =>
      val base = Seq((1L, 0L, 0L, Option.empty[Long]), (2L, 0L, 0L, Option.empty[Long]))
        .toDF("k", "v", "valid_from", "valid_to")
      val all = chs.toDF("k", "v", "ts", "op")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Long, Option[Long], Boolean)].collect().sortBy(r => (r._1, r._3)).toSeq
      val oneShot = canon(Cdc.applyChangesetScd2(base, all,
        Seq("k"), Seq("v"), "ts", "op"))
      val firstHalf = Cdc.applyChangesetScd2(base,
          all.filter(col("ts") < cut), Seq("k"), Seq("v"), "ts", "op")
        .drop("is_current")
      val twoStep = canon(Cdc.applyChangesetScd2(firstHalf,
        all.filter(col("ts") >= cut), Seq("k"), Seq("v"), "ts", "op"))
      oneShot == twoStep
    }, tests = 20)
  }

  test("pairMetrics accounting: tp+fp = |candidates|, tp+fn = |truth| for any sets") {
    import graft.llm.Dedup
    val pairsGen = Gen.listOfN(10, for {
      a <- Gen.choose(1L, 6L); b <- Gen.choose(1L, 6L)
    } yield (a, b))
    run(Prop.forAll(pairsGen, pairsGen) { (cs, ts) =>
      val m = Dedup.pairMetrics(cs.toDF("id_a", "id_b"), ts.toDF("id_a", "id_b"))
        .as[(Long, Long, Long, Option[Double], Option[Double])].head()
      def canon(ps: List[(Long, Long)]) =
        ps.filter(p => p._1 != p._2)
          .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      m._1 + m._2 == canon(cs).size && m._1 + m._3 == canon(ts).size
    }, tests = 30)
  }

  test("graph laws: LPA labels are vertex ids; modularity bounded; SSSP triangle inequality") {
    val edgesGen = Gen.listOfN(20, for {
      a <- Gen.choose(1L, 10L); b <- Gen.choose(1L, 10L) if a != b
    } yield (a, b))
    run(Prop.forAll(edgesGen) { es =>
      es.nonEmpty && {
        val edges = es.toDF("src", "dst")
        val labels = Graph.labelPropagation(edges, rounds = 2)
          .as[(Long, Long)].collect()
        val verts = es.flatMap(e => Seq(e._1, e._2)).toSet
        // every labelled vertex is a graph vertex and every label is too
        val labelLaw = labels.forall(l => verts(l._1) && verts(l._2))
        // modularity of that labelling is a valid rational in [-1/2, 1]
        val q = Graph.modularity(edges, labels.toSeq.toDF("v", "label"))
          .as[(Long, Long, Long, Long)].head()
        val qv = q._3.toDouble / q._4
        labelLaw && qv <= 1.0 + 1e-12 && qv >= -0.5 - 1e-12
      }
    }, tests = 20)

    // SSSP: converged distances satisfy the relaxation fixpoint —
    // no edge (u,v,w) with d(u) + w < d(v)
    val wEdgesGen = Gen.listOfN(16, for {
      a <- Gen.choose(1L, 8L); b <- Gen.choose(1L, 8L) if a != b
      w <- Gen.choose(1L, 9L)
    } yield (a, b, w))
    run(Prop.forAll(wEdgesGen) { es =>
      es.nonEmpty && {
        val d = Graph.shortestPaths(es.toDF("src", "dst", "w"),
            Seq(1L).toDF("v"), maxRounds = 20)
          .as[(Long, Long)].collect().toMap
        // pre-min parallel edges like the operator does
        val minW = es.groupBy(e => (e._1, e._2))
          .map { case (k, g) => k -> g.map(_._3).min }
        minW.forall { case ((u, v), w) =>
          d.get(u).forall(du => d.get(v).exists(dv => dv <= du + w))
        }
      }
    }, tests = 20)
  }

  test("SCC law: same component iff mutually reachable, for any small digraph") {
    // the defining property, checked against brute-force transitive
    // closure on random digraphs (n <= 10, both Tarjan driver path and,
    // on a sample, the distributed coloring path)
    val edgeGen = Gen.choose(5, 18).flatMap(k => Gen.listOfN(k, for {
      s <- Gen.choose(1L, 10L); t <- Gen.choose(1L, 10L) if s != t
    } yield (s, t)))
    var distributedChecked = 0
    run(Prop.forAll(edgeGen) { es =>
      val edges = es.toDF("src", "dst")
      val comp = Graph.stronglyConnectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      // brute-force closure over the vertex set
      val verts = (es.map(_._1) ++ es.map(_._2)).distinct
      val reach = scala.collection.mutable.Set[(Long, Long)](verts.map(v => (v, v)): _*)
      reach ++= es
      var grew = true
      while (grew) {
        val add = for ((a, b) <- reach.toSeq; (c, d) <- es if b == c &&
          !reach((a, d))) yield (a, d)
        grew = add.nonEmpty
        reach ++= add
      }
      val lawHolds = verts.forall(u => verts.forall(v =>
        (comp(u) == comp(v)) == (reach((u, v)) && reach((v, u)))))
      val labelsAreMinMembers = comp.groupBy(_._2).forall { case (c, m) =>
        m.keys.min == c
      }
      // the distributed path must agree on a sample (it's ~100x slower)
      val distAgrees = if (distributedChecked >= 3) true else {
        distributedChecked += 1
        Graph.stronglyConnectedComponents(edges, localThreshold = 0)
          .as[(Long, Long)].collect().toMap == comp
      }
      lawHolds && labelsAreMinMembers && distAgrees
    }, tests = 20)
  }

  test("span dedup conservation: removed = total chunks - distinct chunks, any corpus") {
    import graft.llm.Dedup
    val docsGen = Gen.listOfN(6, Gen.listOfN(8,
      Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    run(Prop.forAll(docsGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.removeDuplicateSpans(docs, "doc_id", chunkTokens = 2)
        .as[(Long, String, Long, Long)].collect()
      val allChunks = texts.flatMap(_.split(" ").grouped(2).map(_.mkString(" ")))
      out.map(_._4).sum == allChunks.size - allChunks.distinct.size &&
        out.map(_._3).sum == allChunks.size
    }, tests = 25)
  }
}
