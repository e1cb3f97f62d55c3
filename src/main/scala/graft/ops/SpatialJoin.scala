package graft.ops

import graft.geo.{Geo, Quadkey}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/**
 * Spatial join operators (SURVEY.md §2.3 J1-J8).
 *
 * Two physical strategies, chosen by the caller:
 *
 *  1. [[broadcastMatch]] / [[probabilityByThreshold]] — the reference's hot
 *     join is tiles × ≤51·8=408 envelope polygons per storm
 *     (impact_analysis.py:1884-1891). The small side is broadcast as WKB and
 *     *prepared* (JTS PreparedGeometry: cached edge index) once per executor
 *     thread; each big-side row is tested against all prepared geometries in
 *     a single narrow pass. No shuffle at all — the classic
 *     sjoin→groupBy(tile).count() becomes a per-row closed-form count. This
 *     scales linearly with tiles and survives 1000 executors unchanged
 *     (broadcast is a few hundred KB).
 *
 *  2. [[quadkeyRefineJoin]] — filter-refine equi-join for the case where BOTH
 *     sides are large (no broadcast possible): cover each geometry's envelope
 *     with Web-Mercator cells at a chosen zoom, explode, shuffle on the cell
 *     key (spatially local ⇒ prefix-local), then refine with the exact JTS
 *     predicate and de-duplicate pairs. This is the 100 TB path.
 */
object SpatialJoin {

  /** Per-thread prepared-geometry cache: broadcast WKB is deserialized and
    * prepared at most once per (executor thread × broadcast). JTS
    * PreparedGeometry lazily builds internal indexes and is not guaranteed
    * thread-safe, hence per-thread instances. */
  private def preparedCache(bc: Broadcast[Array[Array[Byte]]]): graft.util.ThreadLocalCache[Array[PreparedGeometry]] =
    new graft.util.ThreadLocalCache(() =>
      bc.value.map(b => PreparedGeometryFactory.prepare(Geo.fromWkb(b))))

  sealed trait Predicate { def eval(prepared: PreparedGeometry, probe: Geometry): Boolean }
  case object Intersects extends Predicate {
    def eval(p: PreparedGeometry, g: Geometry): Boolean = p.intersects(g)
  }
  case object Contains extends Predicate {
    def eval(p: PreparedGeometry, g: Geometry): Boolean = p.contains(g)
  }

  /**
   * Generic broadcast spatial match: returns `big` with an extra column
   * `matchCol: Array[Int]` of indices into `smallRows` (the collected small
   * side) whose geometry satisfies `predicate(small, bigGeom)`.
   * Caller explodes / joins the indices as needed.
   */
  def broadcastMatch(big: DataFrame, bigGeomCol: String,
                     smallGeomsWkb: Array[Array[Byte]], predicate: Predicate,
                     matchCol: String): DataFrame = {
    val spark = big.sparkSession
    val bc = spark.sparkContext.broadcast(smallGeomsWkb)
    val cache = preparedCache(bc)
    val matcher = udf { (g: Array[Byte]) =>
      if (g == null) null
      else {
        val probe = Geo.fromWkb(g)
        val prep = cache.get
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < prep.length) { if (predicate.eval(prep(i), probe)) out += i; i += 1 }
        out.toArray
      }
    }
    big.withColumn(matchCol, matcher(col(bigGeomCol)))
  }

  /**
   * The reference's central operator (J1/J2): per zone (tile or buffered
   * facility), per wind threshold, probability = (# ensemble members whose
   * envelope intersects the zone) / denominator. Denominator is the FIXED
   * full ensemble size 51 (impact_analysis.py:185-188) — never the observed
   * member count.
   *
   * Input `envelopes` must have columns (windThresholdCol: Int, geomCol:
   * WKB). Output = `zones` × thresholds-with-nonzero-count, plus
   * `wind_threshold` and `probability` columns. Narrow-only plan: one UDF
   * pass + one explode, zero shuffles.
   */
  def probabilityByThreshold(zones: DataFrame, zoneGeomCol: String,
                             envelopes: DataFrame, envGeomCol: String,
                             windThresholdCol: String = "wind_threshold",
                             denominator: Int = graft.pipeline.Constants.FullEnsembleSize,
                             keepZeroRows: Boolean = false): DataFrame = {
    val spark = zones.sparkSession
    val envRows = graft.util.Collects.boundedCollect(
      envelopes.select(col(windThresholdCol), col(envGeomCol)),
      what = "probabilityByThreshold envelope side",
      alternative = "SpatialJoin.quadkeyRefineJoin + groupBy")
    val thresholds = envRows.map(_.getInt(0))
    val geoms = envRows.map(_.getAs[Array[Byte]](1))
    val distinctTh = thresholds.distinct.sorted
    val bc = spark.sparkContext.broadcast(geoms)
    val thBc = spark.sparkContext.broadcast(thresholds)
    val dtBc = spark.sparkContext.broadcast(distinctTh)
    val cache = preparedCache(bc)
    // per zone: Array[(threshold, count)] over ALL distinct thresholds
    val counter = udf { (g: Array[Byte]) =>
      if (g == null) null
      else {
        val probe = Geo.fromWkb(g)
        val prep = cache.get
        val ths = thBc.value
        val counts = scala.collection.mutable.LinkedHashMap(
          dtBc.value.toIndexedSeq.map(_ -> 0): _*)
        var i = 0
        while (i < prep.length) {
          if (prep(i).intersects(probe)) counts(ths(i)) += 1
          i += 1
        }
        counts.toArray
      }
    }.apply(col(zoneGeomCol))

    val counted = zones.withColumn("__tc", explode(counter))
      .withColumn("wind_threshold", col("__tc._1"))
      .withColumn("n_members", col("__tc._2"))
      .drop("__tc")
      .withColumn("probability", col("n_members").cast(DoubleType) / lit(denominator.toDouble))
    if (keepZeroRows) counted else counted.filter(col("n_members") > 0)
  }

  /**
   * Filter-refine spatial equi-join for two LARGE sides (100 TB path).
   * Each side's geometries are covered with quadkey cells at `zoom`;
   * the join shuffles on the cell key; candidate pairs are refined with the
   * exact JTS intersects predicate; duplicates (a pair sharing several
   * cells) are removed by keeping only the pair's lexicographically-least
   * common cell (the standard "reference point" dedup — no distinct shuffle).
   *
   * `salts > 1` splits each cell key across that many reducers for skewed
   * data (one mega-city cell holding a large share of the left side): the
   * left side gets a deterministic per-row salt digit, the right side is
   * replicated across all digits, so every candidate pair still meets
   * exactly once per common cell and the output is identical to `salts = 1`.
   * Costs a `salts`× replication of the right side's shuffled bytes — use
   * with the denser side as `left`.
   */
  def quadkeyRefineJoin(left: DataFrame, leftGeom: String,
                        right: DataFrame, rightGeom: String,
                        zoom: Int, salts: Int = 1): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val coverUdf = udf { (g: Array[Byte]) =>
      if (g == null) null
      else {
        val env = Geo.fromWkb(g).getEnvelopeInternal
        Quadkey.cover(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, zoom)
      }
    }
    val l0 = left.withColumn("__cell", explode(coverUdf(col(leftGeom))))
    val r0 = right.withColumn("__cell", explode(coverUdf(col(rightGeom))))
    val (l, r, joinKeys) =
      if (salts == 1) (l0, r0, Seq("__cell"))
      else (l0.withColumn("__salt", pmod(xxhash64(col(leftGeom)), lit(salts.toLong)).cast("int")),
            r0.withColumn("__salt", explode(array((0 until salts).map(lit): _*))),
            Seq("__cell", "__salt"))
    val joined = l.join(r, joinKeys)
    val intersectsUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
      Geo.fromWkb(a).intersects(Geo.fromWkb(b))
    }
    val minCommonCell = udf { (a: Array[Byte], b: Array[Byte]) =>
      val ea = Geo.fromWkb(a).getEnvelopeInternal
      val eb = Geo.fromWkb(b).getEnvelopeInternal
      val ix = math.max(ea.getMinX, eb.getMinX); val ax = math.min(ea.getMaxX, eb.getMaxX)
      val iy = math.max(ea.getMinY, eb.getMinY); val ay = math.min(ea.getMaxY, eb.getMaxY)
      Quadkey.cover(ix, iy, ax, ay, zoom).min
    }
    joined
      .filter(col("__cell") === minCommonCell(col(leftGeom), col(rightGeom)))
      .filter(intersectsUdf(col(leftGeom), col(rightGeom)))
      .drop("__cell", "__salt")
  }
}
