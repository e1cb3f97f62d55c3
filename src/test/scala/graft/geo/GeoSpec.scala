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
    assert(math.abs(yN - 6378137.0 * math.sqrt(2)) < 1.0)
    // equator scaling: x = R * 2*sqrt(2)/pi * lon
    val (x90, _) = Geo.mollweideForward(90, 0)
    assert(math.abs(x90 - 6378137.0 * 2 * math.sqrt(2) / math.Pi * (math.Pi / 2)) < 1.0)
  }

  test("equal-area area of a 1-degree box at equator ~ 111.19km * 110.57km") {
    val a = Geo.areaM2(Geo.box(0, 0, 1, 0) match { case _ => Geo.box(0, 0, 1, 1) })
    // spherical area of 1°x1° at equator: R^2 * dLon * (sin(lat2)-sin(lat1))
    val r = 6378137.0
    val expected = r * r * math.toRadians(1.0) * (math.sin(math.toRadians(1.0)) - 0)
    assert(math.abs(a - expected) / expected < 0.01, s"got $a expected $expected")
  }

  test("area is latitude-invariant under equal-area projection (equal-area property)") {
    // two boxes with the same spherical area at different latitudes
    val r = 6378137.0
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

  // ----- geodesy goldens (SURVEY §7.4 "matches geopandas"): the kernel
  // pinned against PUBLISHED constants and closed forms, not itself -----

  test("golden: Mollweide world extents match the published ESRI:54009 bounds") {
    // World Mollweide on WGS84 via PROJ projects (±180°, 0°) to
    // x = ±2√2·a and (0°, ±90°) to y = ±√2·a with a = 6378137 m — the
    // widely published projected bounds ±18,040,095.7 × ±9,020,047.8 m.
    // This pins the radius CONVENTION (PROJ uses the semimajor axis for
    // spherical-only projections), which no self-consistency test can.
    val (xMax, y0) = Geo.mollweideForward(180.0, 0.0)
    assert(math.abs(xMax - 18040095.7) < 1.0, s"xMax=$xMax")
    assert(math.abs(y0) < 1e-6)
    val (x0, yMax) = Geo.mollweideForward(0.0, 90.0)
    assert(math.abs(yMax - 9020047.85) < 1.0, s"yMax=$yMax")
    assert(math.abs(x0) < 1e-6)
  }

  test("golden: Mollweide forward satisfies the defining equation on a grid") {
    // independent check of the Newton solve: recover θ from y and verify
    // 2θ + sin 2θ = π sin φ and x = a(2√2/π)·λ·cos θ — the projection's
    // defining relations (Snyder, "Map Projections: A Working Manual")
    val a = 6378137.0
    for (lon <- Seq(-180.0, -75.0, 0.0, 33.5, 179.0);
         lat <- Seq(-89.0, -45.0, -10.0, 0.0, 23.4375, 50.0, 88.0)) {
      val (x, y) = Geo.mollweideForward(lon, lat)
      val sinTheta = y / (a * math.sqrt(2.0))
      assert(math.abs(sinTheta) <= 1.0 + 1e-12)
      val theta = math.asin(math.max(-1.0, math.min(1.0, sinTheta)))
      val lhs = 2 * theta + math.sin(2 * theta)
      val rhs = math.Pi * math.sin(math.toRadians(lat))
      assert(math.abs(lhs - rhs) < 1e-9, s"defining eq at ($lon,$lat): $lhs vs $rhs")
      val xExp = a * (2 * math.sqrt(2.0) / math.Pi) *
        math.toRadians(lon) * math.cos(theta)
      assert(math.abs(x - xExp) < 1e-6, s"x at ($lon,$lat): $x vs $xExp")
    }
  }

  test("golden: areaM2 of a densified box matches the closed-form sphere area") {
    // Mollweide is equal-area: the planar area of a (densified) projected
    // lon/lat box must equal the spherical zone area R²·Δλ·(sinφ₂−sinφ₁).
    // Densification matters — geopandas shows the same vertex-density
    // sensitivity (straight projected edges under-cover) — so the golden
    // uses 0.01° steps and a 0.05% tolerance.
    val a = 6378137.0
    def closedForm(lon1: Double, lon2: Double, lat1: Double, lat2: Double): Double =
      a * a * math.toRadians(lon2 - lon1) *
        (math.sin(math.toRadians(lat2)) - math.sin(math.toRadians(lat1)))
    def densBox(lon1: Double, lat1: Double, lon2: Double, lat2: Double): org.locationtech.jts.geom.Geometry = {
      val step = 0.01
      val pts = scala.collection.mutable.ArrayBuffer.empty[org.locationtech.jts.geom.Coordinate]
      def seg(x1: Double, y1: Double, x2: Double, y2: Double): Unit = {
        val n = math.max(1, (math.max(math.abs(x2 - x1), math.abs(y2 - y1)) / step).toInt)
        (0 until n).foreach { i =>
          pts += new org.locationtech.jts.geom.Coordinate(
            x1 + (x2 - x1) * i / n, y1 + (y2 - y1) * i / n)
        }
      }
      seg(lon1, lat1, lon2, lat1); seg(lon2, lat1, lon2, lat2)
      seg(lon2, lat2, lon1, lat2); seg(lon1, lat2, lon1, lat1)
      pts += pts.head
      Geo.factory.createPolygon(pts.toArray)
    }
    Seq((0.0, 0.0, 1.0, 1.0), (30.0, 44.0, 31.0, 45.0), (-10.0, -60.0, -9.0, -59.0))
      .foreach { case (lon1, lat1, lon2, lat2) =>
        val got = Geo.areaM2(densBox(lon1, lat1, lon2, lat2))
        val want = closedForm(lon1, lon2, lat1, lat2)
        assert(math.abs(got - want) / want < 5e-4,
          s"area of [$lon1,$lon2]x[$lat1,$lat2]: $got vs closed-form $want")
      }
  }

  test("golden: Mollweide inverse round-trips the forward to sub-centimeter") {
    for (li <- 0 to 10; pi <- 0 to 10) {
      val lon = -175.0 + li * 35.0
      val lat = -85.0 + pi * 17.0
      val (x, y) = Geo.mollweideForward(lon, lat)
      val (lon2, lat2) = Geo.mollweideInverse(x, y)
      // 1e-9 degrees ≈ 0.1 mm — the Newton solve is the only inexactness
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"round trip ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
    // poles: longitude is indeterminate; latitude must still recover
    val (_, yN) = Geo.mollweideForward(60.0, 90.0)
    assert(math.abs(Geo.mollweideInverse(0.0, yN)._2 - 90.0) < 1e-7)
  }

  test("golden: haversine matches closed-form great-circle arcs") {
    // meridian and equator arcs have exact closed forms on the sphere the
    // engine documents (IUGG mean radius 6371008.8 m)
    val r = 6371008.8
    val oneDeg = math.Pi * r / 180.0 // 111,194.93 m
    assert(math.abs(Geo.haversineMeters(0, 0, 0, 1) - oneDeg) < 1e-6)
    assert(math.abs(Geo.haversineMeters(0, 0, 1, 0) - oneDeg) < 1e-6)
    assert(math.abs(Geo.haversineMeters(0, 0, 90, 0) - math.Pi * r / 2) < 1e-6)
    assert(math.abs(Geo.haversineMeters(0, 0, 180, 0) - math.Pi * r) < 1e-6)
    // 1° of longitude shrinks with cos(lat) on a sphere — at 60°N exactly half
    assert(math.abs(Geo.haversineMeters(0, 60, 1, 60) - oneDeg / 2) < 30)
    // symmetry
    assert(Geo.haversineMeters(12.3, 45.6, -7.8, 9.0) ==
      Geo.haversineMeters(-7.8, 9.0, 12.3, 45.6))
  }
}
