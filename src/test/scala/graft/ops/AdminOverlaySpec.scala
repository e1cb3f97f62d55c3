package graft.ops

import graft.SparkSpec
import graft.geo.Geo

class AdminOverlaySpec extends SparkSpec {

  import spark.implicits._

  private def wkb(minX: Double, minY: Double, maxX: Double, maxY: Double) =
    Geo.toWkb(Geo.box(minX, minY, maxX, maxY))

  // admins: A [0,10]x[0,10], B [10,20]x[0,10]
  private val admins = Seq(("A", wkb(0, 0, 10, 10)), ("B", wkb(10, 0, 20, 10)))
    .toDF("id", "geometry")

  test("step 1: centroid within wins") {
    val tiles = Seq(("t1", wkb(1, 1, 3, 3)), ("t2", wkb(14, 4, 16, 6))).toDF("tile_id", "geometry")
    val out = AdminOverlay.assign(tiles, admins)
      .select("tile_id", "id").as[(String, String)].collect().toMap
    assert(out("t1") == "A" && out("t2") == "B")
  }

  test("step 2: centroid outside all admins -> max overlap area wins") {
    // tile straddles the boundary x=10 but its centroid (10.5) is inside B;
    // build one whose centroid is OUTSIDE both: y in [9,13] centroid y=11 > 10
    // overlap with A: x[8,10]*y[9,10]=2; with B: x[10,11]*y[9,10]=1 -> A
    val tiles = Seq(("t", wkb(8, 9, 11, 13))).toDF("tile_id", "geometry")
    val out = AdminOverlay.assign(tiles, admins).select("id").as[String].head()
    assert(out == "A")
  }

  test("step 3: disjoint tile -> nearest admin wins") {
    // tile centered at (25,5): distance 5 to B's edge (x=20), 15 to A -> B
    val tiles = Seq(("t", wkb(24, 4, 26, 6))).toDF("tile_id", "geometry")
    val out = AdminOverlay.assign(tiles, admins).select("id").as[String].head()
    assert(out == "B")
  }

  test("empty admin set -> null id") {
    val tiles = Seq(("t", wkb(0, 0, 1, 1))).toDF("tile_id", "geometry")
    val empty = Seq.empty[(String, Array[Byte])].toDF("id", "geometry")
    assert(AdminOverlay.assign(tiles, empty).select("id").head().isNullAt(0))
  }

  test("large-side variant agrees with broadcast assign on step-1 cases") {
    val tiles = Seq(("t1", wkb(1, 1, 3, 3)), ("t2", wkb(14, 4, 16, 6))).toDF("tile_id", "geometry")
    val out = AdminOverlay.assignCentroidWithinLarge(tiles, admins, zoom = 6)
      .select("tile_id", "id").as[(String, String)].collect().toMap
    assert(out == Map("t1" -> "A", "t2" -> "B"))
  }
}
