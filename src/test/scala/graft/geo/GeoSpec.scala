package graft.geo

import graft.SparkSpec

class GeoSpec extends SparkSpec {

  test("wkt/wkb round trip") {
    val p = Geo.fromWkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    val back = Geo.fromWkb(Geo.toWkb(p))
    assert(back.equalsExact(p))
  }

  test("mollweide forward matches published reference values") {
    // Known Mollweide property: (0,0) -> (0,0); poles -> y = ±R*sqrt(2)
    val (x0, y0) = Geo.mollweideForward(0, 0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
    val (_, yN) = Geo.mollweideForward(0, 90)
    assert(math.abs(yN - 6371007.180918475 * math.sqrt(2)) < 1.0)
    // equator scaling: x = R * 2*sqrt(2)/pi * lon
    val (x90, _) = Geo.mollweideForward(90, 0)
    assert(math.abs(x90 - 6371007.180918475 * 2 * math.sqrt(2) / math.Pi * (math.Pi / 2)) < 1.0)
  }

  test("equal-area area of a 1-degree box at equator ~ 111.19km * 110.57km") {
    val a = Geo.areaM2(Geo.box(0, 0, 1, 0) match { case _ => Geo.box(0, 0, 1, 1) })
    // spherical area of 1°x1° at equator: R^2 * dLon * (sin(lat2)-sin(lat1))
    val r = 6371007.180918475
    val expected = r * r * math.toRadians(1.0) * (math.sin(math.toRadians(1.0)) - 0)
    assert(math.abs(a - expected) / expected < 0.01, s"got $a expected $expected")
  }

  test("area is latitude-invariant under equal-area projection (equal-area property)") {
    // two boxes with the same spherical area at different latitudes
    val r = 6371007.180918475
    def sphArea(minLat: Double, maxLat: Double, dLon: Double): Double =
      r * r * math.toRadians(dLon) *
        (math.sin(math.toRadians(maxLat)) - math.sin(math.toRadians(minLat)))
    val aEq = Geo.areaM2(Geo.box(0, 0, 1, 1))
    val aHi = Geo.areaM2(Geo.box(10, 59, 11, 60))
    assert(math.abs(aEq / sphArea(0, 1, 1) - 1) < 0.01)
    assert(math.abs(aHi / sphArea(59, 60, 1) - 1) < 0.01)
  }

  test("bufferMeters produces ~metric buffer at mid latitude") {
    val p = Geo.point(-72.0, 45.0)
    val buf = Geo.bufferMeters(p, 1000.0)
    // envelope spans ~2km in both axes, corrected for latitude
    val env = buf.getEnvelopeInternal
    val widthM = (env.getMaxX - env.getMinX) * 111319.49 * math.cos(math.toRadians(45.0))
    val heightM = (env.getMaxY - env.getMinY) * 111319.49
    assert(math.abs(widthM - 2000) < 20, s"width $widthM")
    assert(math.abs(heightM - 2000) < 20, s"height $heightM")
  }

  test("haversine: 1 degree of longitude at equator ~ 111.2 km") {
    val d = Geo.haversineMeters(0, 0, 1, 0)
    assert(math.abs(d - 111195) < 200, s"got $d")
  }

  test("makeValid repairs a bowtie polygon") {
    val bowtie = Geo.fromWkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert(!bowtie.isValid)
    val fixed = Geo.makeValid(bowtie)
    assert(fixed.isValid)
    assert(fixed.getArea > 0)
  }

  test("unionAll merges overlapping boxes") {
    val u = Geo.unionAll(Seq(Geo.box(0, 0, 2, 2), Geo.box(1, 1, 3, 3)))
    assert(math.abs(u.getArea - 7.0) < 1e-9) // 4 + 4 - 1
  }
}
