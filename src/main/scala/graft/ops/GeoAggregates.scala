package graft.ops

import graft.geo.Geo
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Geometry

/**
 * Geometric aggregates and geo screening joins (SURVEY.md J7/J8/J10).
 */
object GeoAggregates {

  /**
   * ST_Union_Agg (J10; reference union_all impact_analysis.py:1158,
   * ST_UNION_AGG snowflake_utils.py:603): distributive union over WKB.
   * Implemented as an Aggregator — Spark runs it partially per partition
   * (map-side combine), so the driver only unions one geometry per
   * partition. Buffers accumulate a batch of geometries and collapse via
   * JTS cascaded union to keep buffer size bounded.
   */
  object UnionAgg extends Aggregator[Array[Byte], Array[Array[Byte]], Array[Byte]] {
    private val CollapseAt = 32
    def zero: Array[Array[Byte]] = Array.empty
    private def collapse(buf: Array[Array[Byte]]): Array[Array[Byte]] =
      if (buf.length < CollapseAt) buf
      else Array(Geo.toWkb(Geo.unionAll(buf.map(Geo.fromWkb).toSeq)))
    def reduce(buf: Array[Array[Byte]], g: Array[Byte]): Array[Array[Byte]] =
      if (g == null) buf else collapse(buf :+ g)
    def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] =
      collapse(a ++ b)
    def finish(buf: Array[Array[Byte]]): Array[Byte] =
      if (buf.isEmpty) null else Geo.toWkb(Geo.unionAll(buf.map(Geo.fromWkb).toSeq))
    def bufferEncoder: Encoder[Array[Array[Byte]]] = Encoders.kryo[Array[Array[Byte]]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def st_union_agg(c: Column): Column = udaf(UnionAgg).apply(c)

  /**
   * Country range screen (J7, snowflake_utils.py:590-616 + Python fallback
   * main_pipeline.py:176-217): which countries lie within `meters` of the
   * union of all storm envelopes. The envelope union is computed once
   * (broadcast, a few hundred KB at most) and each country row is tested in
   * a narrow pass — the cheap first job that prunes all downstream work.
   */
  def countriesInRange(countries: DataFrame, countryGeomCol: String,
                       envelopes: DataFrame, envGeomCol: String,
                       meters: Double = graft.pipeline.Constants.CountryRangeMeters): DataFrame = {
    val spark = countries.sparkSession
    val envUnionWkb = envelopes.select(st_union_agg(col(envGeomCol)).as("u"))
      .head().getAs[Array[Byte]]("u")
    if (envUnionWkb == null) return countries.limit(0)
    val bc = spark.sparkContext.broadcast(envUnionWkb)
    val cache = new graft.util.ThreadLocalCache[Geometry](() => Geo.fromWkb(bc.value))
    val inRange = udf { (g: Array[Byte]) =>
      if (g == null) false
      else Geo.distanceMeters(Geo.fromWkb(g), cache.get) <= meters
    }
    countries.filter(inRange(col(countryGeomCol)))
  }

  /** Buffer-intersects fallback (J8): country buffered by `meters`
    * (geometry-repaired, dateline-split — a Pacific country's 1500 km
    * buffer crossing ±180° folds back into canonical lon/lat so envelopes
    * on either side of the seam can hit it), any-envelope-intersects
    * boolean. */
  def countryIntersectsBuffered(countryWkb: Array[Byte], envelopes: DataFrame,
                                envGeomCol: String, meters: Double): Boolean = {
    val buffered = Geo.bufferMetersDateline(Geo.makeValid(Geo.fromWkb(countryWkb)), meters)
    val bWkb = Geo.toWkb(buffered)
    val spark = envelopes.sparkSession
    val bc = spark.sparkContext.broadcast(bWkb)
    val cache = new graft.util.ThreadLocalCache[org.locationtech.jts.geom.prep.PreparedGeometry](
      () => org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(Geo.fromWkb(bc.value)))
    val hit = udf { (g: Array[Byte]) => g != null && cache.get.intersects(Geo.fromWkb(g)) }
    !envelopes.filter(hit(col(envGeomCol))).isEmpty
  }

  /** Consecutive track points → line segments (W4, reports.py:224-254):
    * lead window + ST_MakeLine; attributes come from the segment's first
    * point; the last point of each member emits no segment. */
  def linesFromPoints(points: DataFrame, partitionCols: Seq[String],
                      orderCol: String, geomCol: String = "geometry"): DataFrame = {
    import graft.geo.GeoFunctions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    points
      .withColumn("__next", lead(col(geomCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .withColumn(geomCol, st_make_line(col(geomCol), col("__next")))
      .drop("__next")
  }
}
