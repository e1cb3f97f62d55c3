package graft.pipeline

import graft.SparkSpec

class ModelSpec extends SparkSpec {

  import spark.implicits._

  test("typed zone probabilities + typed transform") {
    val tiles = SyntheticScenario.tiles(spark, nx = 8, ny = 8)
    val envs = SyntheticScenario.envelopes(spark, members = 17)
    val tv = ImpactPipeline.tileView(tiles, envs)
    val ds = Model.zoneProbabilities(tv)
    assert(ds.head().probability >= 0)
    val maxTh = Model.maxThresholdPerZone(ds).collect().toMap
    // every reported max threshold is one of the envelope thresholds
    val thSet = envs.select("wind_threshold").distinct().as[Int].collect().toSet
    assert(maxTh.values.forall(thSet.contains))
    // monotone nesting: the per-zone max equals the largest threshold whose
    // probability > 0 in the raw view
    val raw = tv.filter($"probability" > 0)
      .groupBy("zone_id").agg(org.apache.spark.sql.functions.max("wind_threshold").as("m"))
      .as[(String, Int)].collect().toMap
    assert(maxTh == raw)
  }

  test("typed envelope encoding round-trips") {
    val e = Model.Envelope(1, 34, graft.geo.Geo.toWkb(graft.geo.Geo.box(0, 0, 1, 1)))
    val ds = spark.createDataset(Seq(e))(Model.envelopeEncoder)
    val back = ds.head()
    assert(back.ensemble_member == 1 && back.wind_threshold == 34)
    assert(java.util.Arrays.equals(back.geometry, e.geometry))
  }
}
