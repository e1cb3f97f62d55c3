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
}
