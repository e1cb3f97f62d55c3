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

  // --- antimeridian (reference main_pipeline.py:211-214) ------------------

  test("spansAntimeridian + unwrap: Fiji-style two-lobe country") {
    val fiji = Geo.unionAll(Seq(
      Geo.box(178.0, -19.0, 180.0, -16.0),    // eastern lobe, +lons
      Geo.box(-180.0, -19.0, -178.5, -16.0))) // western lobe, -lons
    assert(Geo.spansAntimeridian(fiji))
    val unwrapped = Geo.unwrapAntimeridian(fiji)
    val env = unwrapped.getEnvelopeInternal
    assert(env.getMinX == 178.0 && math.abs(env.getMaxX - 181.5) < 1e-9)
    assert(!Geo.spansAntimeridian(unwrapped))
    // area preserved by the rigid shift
    assert(math.abs(unwrapped.getArea - fiji.getArea) < 1e-9)
  }

  test("splitAntimeridian folds overflow into a canonical multi-part geometry") {
    val overflowing = Geo.box(176.0, -19.0, 184.0, -16.0) // runs past +180
    val split = Geo.splitAntimeridian(overflowing)
    val env = split.getEnvelopeInternal
    assert(env.getMinX >= -180 && env.getMaxX <= 180)
    assert(split.getNumGeometries == 2)
    assert(math.abs(split.getArea - overflowing.getArea) < 1e-9)
    // identity away from the seam
    val plain = Geo.box(0, 0, 2, 2)
    assert(Geo.splitAntimeridian(plain) eq plain)
  }

  test("bufferMetersDateline: Fiji-style buffered country intersects an envelope at -179") {
    val fiji = Geo.unionAll(Seq(
      Geo.box(178.0, -19.0, 180.0, -16.0),
      Geo.box(-180.0, -19.0, -178.5, -16.0)))
    val buffered = Geo.bufferMetersDateline(fiji, 150000.0) // 150 km
    val env = buffered.getEnvelopeInternal
    assert(env.getMinX >= -180 && env.getMaxX <= 180, s"not canonical: $env")
    // an envelope fully on the western side of the seam must hit the buffer
    val envelopeWest = Geo.box(-179.4, -18.0, -178.9, -17.0)
    assert(buffered.intersects(envelopeWest))
    // and one on the eastern side too
    assert(buffered.intersects(Geo.box(178.5, -18.0, 179.5, -17.0)))
    // a naive (non-dateline) buffer of the raw two-lobe shape would span
    // nearly the whole globe instead of the ~5 degrees + buffer it should
    assert(env.getMaxX - env.getMinX > 180) // canonical multi-part: lobes on both sides
    assert(buffered.getNumGeometries >= 2)
    // the old path measures the two-lobe centroid mid-Pacific and buffers a
    // globe-spanning blob; the dateline path keeps total area ~ buffer-true
    val oneSide = Geo.bufferMeters(Geo.box(178.0, -19.0, 180.0, -16.0), 150000.0)
    assert(buffered.getArea < 4 * oneSide.getArea, "buffer blew up across the globe")
  }

  test("buffer overflowing past -180 folds onto the +180 side") {
    val nearSeam = Geo.box(-179.8, -19.0, -179.0, -16.0)
    val buffered = Geo.bufferMetersDateline(nearSeam, 150000.0)
    val env = buffered.getEnvelopeInternal
    assert(env.getMinX >= -180 && env.getMaxX <= 180)
    assert(buffered.getNumGeometries == 2) // the overflow landed at +180-side
    assert(buffered.intersects(Geo.box(179.0, -18.0, 179.9, -17.0)))
  }

  test("distanceMeters measures across the antimeridian, not the long way round") {
    val a = Geo.box(179.0, -18.0, 179.9, -17.0)
    val b = Geo.box(-179.9, -18.0, -179.0, -17.0)
    val d = Geo.distanceMeters(a, b)
    // 0.2 degrees of lon at ~17.5S: ~21 km, NOT ~38,000 km
    assert(d < 25000, s"got $d")
    // unchanged for ordinary geometries
    assert(math.abs(Geo.distanceMeters(Geo.point(0, 0), Geo.point(1, 0)) - 111195) < 200)
  }
}
