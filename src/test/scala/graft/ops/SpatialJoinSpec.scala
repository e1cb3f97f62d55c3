package graft.ops

import graft.SparkSpec
import graft.geo.Geo
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends SparkSpec {

  import spark.implicits._

  private def wkb(minX: Double, minY: Double, maxX: Double, maxY: Double) =
    Geo.toWkb(Geo.box(minX, minY, maxX, maxY))

  test("probabilityByThreshold: hand-computed 3-tile fixture") {
    // tiles: A [0,1]^2, B [2,3]x[0,1], C [10,11]^2
    val tiles = Seq(
      ("A", wkb(0, 0, 1, 1)),
      ("B", wkb(2, 0, 3, 1)),
      ("C", wkb(10, 10, 11, 11))).toDF("tile_id", "geometry")
    // envelopes: th=34 two members cover A and A+B; th=64 one member covers B only
    val envs = Seq(
      (1, 34, wkb(0.5, 0.5, 2.5, 0.6)), // intersects A and B
      (2, 34, wkb(0.2, 0.2, 0.8, 0.8)), // A only
      (1, 64, wkb(2.1, 0.1, 2.9, 0.9))  // B only
    ).toDF("ensemble_member", "wind_threshold", "geometry")

    val out = SpatialJoin.probabilityByThreshold(tiles, "geometry", envs, "geometry",
      keepZeroRows = true)
      .select("tile_id", "wind_threshold", "n_members", "probability")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getInt(2), r.getDouble(3))).toMap

    assert(out(("A", 34)) == ((2, 2.0 / 51)))
    assert(out(("A", 64)) == ((0, 0.0)))
    assert(out(("B", 34)) == ((1, 1.0 / 51)))
    assert(out(("B", 64)) == ((1, 1.0 / 51)))
    assert(out(("C", 34)) == ((0, 0.0)))
    // fixed denominator: 51 even though only ≤2 members present
    assert(out.size == 6)
  }

  test("probabilityByThreshold drops zero rows by default") {
    val tiles = Seq(("A", wkb(0, 0, 1, 1))).toDF("tile_id", "geometry")
    val envs = Seq((1, 34, wkb(5, 5, 6, 6))).toDF("ensemble_member", "wind_threshold", "geometry")
    assert(SpatialJoin.probabilityByThreshold(tiles, "geometry", envs, "geometry").count() == 0)
  }

  test("boundary touch counts as intersecting (closed-set semantics)") {
    val tiles = Seq(("A", wkb(0, 0, 1, 1))).toDF("tile_id", "geometry")
    val envs = Seq((1, 34, wkb(1, 0, 2, 1))).toDF("ensemble_member", "wind_threshold", "geometry")
    val out = SpatialJoin.probabilityByThreshold(tiles, "geometry", envs, "geometry").collect()
    assert(out.length == 1 && out(0).getAs[Int]("n_members") == 1)
  }

  test("quadkeyRefineJoin agrees with broadcast join on random boxes") {
    val rng = new scala.util.Random(7)
    val left = (1 to 60).map { i =>
      val x = rng.nextDouble() * 2; val y = rng.nextDouble() * 2
      (s"L$i", wkb(x, y, x + 0.3, y + 0.3))
    }.toDF("lid", "geometry")
    val right = (1 to 40).map { i =>
      val x = rng.nextDouble() * 2; val y = rng.nextDouble() * 2
      (s"R$i", wkb(x, y, x + 0.2, y + 0.2))
    }.toDF("rid", "rgeometry")

    val refined = SpatialJoin.quadkeyRefineJoin(left, "geometry", right, "rgeometry", zoom = 8)
      .select("lid", "rid").as[(String, String)].collect().toSet

    // brute force ground truth
    val lRows = left.collect().map(r => (r.getString(0), Geo.fromWkb(r.getAs[Array[Byte]](1))))
    val rRows = right.collect().map(r => (r.getString(0), Geo.fromWkb(r.getAs[Array[Byte]](1))))
    val expected = (for {
      (lid, lg) <- lRows; (rid, rg) <- rRows if lg.intersects(rg)
    } yield (lid, rid)).toSet

    assert(refined == expected, s"missing=${expected -- refined} extra=${refined -- expected}")

    // salted variant (skew fan-out) must produce the identical pair set:
    // each pair still meets exactly once per common cell
    val salted = SpatialJoin.quadkeyRefineJoin(left, "geometry", right, "rgeometry",
        zoom = 8, salts = 4)
      .select("lid", "rid").as[(String, String)].collect().toSet
    assert(salted == expected, s"missing=${expected -- salted} extra=${salted -- expected}")
  }

  test("broadcastMatch contains predicate") {
    val pts = Seq(("p1", Geo.toWkb(Geo.point(0.5, 0.5))), ("p2", Geo.toWkb(Geo.point(5, 5))))
      .toDF("pid", "geometry")
    val zones = Array(wkb(0, 0, 1, 1))
    val out = SpatialJoin.broadcastMatch(pts, "geometry", zones, SpatialJoin.Contains, "m")
      .select($"pid", size($"m").as("n")).as[(String, Int)].collect().toMap
    // Contains is evaluated as zone.contains(point)
    assert(out("p1") == 1 && out("p2") == 0)
  }
}
