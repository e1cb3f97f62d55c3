package graft.geo

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.Geometry

/**
 * Native Catalyst `Expression` implementations of the hot ST_* functions
 * (SURVEY.md §2.9: "UDF v0 → Expression v1"). Compared to Scala UDFs these
 * avoid the UDF serialization boundary (no Row → Scala conversion, no
 * closure dispatch) and participate in null-intolerant short-circuiting;
 * evaluation stays `CodegenFallback` (a hand-written doGenCode would only
 * wrap the same JTS call).
 *
 * Registered for SQL by [[GraftExtensions]]; Column-API wrappers in
 * [[GeoFunctions.native]].
 */
object GeoExpressions {

  @inline private def geom(a: Any): Geometry = Geo.fromWkb(a.asInstanceOf[Array[Byte]])

  case class StGeomFromWkt(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(wkt: Any): Any =
      Geo.tryFromWkt(wkt.asInstanceOf[UTF8String].toString).map(Geo.toWkb).orNull
    override protected def withNewChildInternal(c: Expression): StGeomFromWkt = copy(c)
    override def prettyName: String = "st_geomfromwkt"
  }

  case class StAsWkt(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(b: Any): Any = UTF8String.fromString(Geo.toWkt(geom(b)))
    override protected def withNewChildInternal(c: Expression): StAsWkt = copy(c)
    override def prettyName: String = "st_aswkt"
  }

  case class StPoint(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(lon: Any, lat: Any): Any =
      Geo.toWkb(Geo.point(lon.asInstanceOf[Double], lat.asInstanceOf[Double]))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StPoint =
      copy(l, r)
    override def prettyName: String = "st_point"
  }

  case class StIntersects(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(a: Any, b: Any): Any = geom(a).intersects(geom(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersects =
      copy(l, r)
    override def prettyName: String = "st_intersects"
  }

  case class StWithin(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(a: Any, b: Any): Any = geom(a).within(geom(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StWithin =
      copy(l, r)
    override def prettyName: String = "st_within"
  }

  case class StContains(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(a: Any, b: Any): Any = geom(a).contains(geom(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StContains =
      copy(l, r)
    override def prettyName: String = "st_contains"
  }

  case class StAreaM2(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(b: Any): Any = Geo.areaM2(geom(b))
    override protected def withNewChildInternal(c: Expression): StAreaM2 = copy(c)
    override def prettyName: String = "st_area_m2"
  }

  case class StCentroid(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(b: Any): Any = Geo.toWkb(Geo.centroid(geom(b)))
    override protected def withNewChildInternal(c: Expression): StCentroid = copy(c)
    override def prettyName: String = "st_centroid"
  }

  case class StBufferMeters(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(b: Any, m: Any): Any =
      Geo.toWkb(Geo.bufferMeters(geom(b), m.asInstanceOf[Double]))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StBufferMeters =
      copy(l, r)
    override def prettyName: String = "st_buffer_m"
  }

  case class StDistanceMeters(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = Geo.distanceMeters(geom(a), geom(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StDistanceMeters =
      copy(l, r)
    override def prettyName: String = "st_distance_m"
  }

  /** Function registry entries: name -> builder. */
  val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "st_geomfromwkt" -> (es => StGeomFromWkt(es.head)),
    "st_aswkt" -> (es => StAsWkt(es.head)),
    "st_point" -> (es => StPoint(es(0), es(1))),
    "st_intersects" -> (es => StIntersects(es(0), es(1))),
    "st_within" -> (es => StWithin(es(0), es(1))),
    "st_contains" -> (es => StContains(es(0), es(1))),
    "st_area_m2" -> (es => StAreaM2(es.head)),
    "st_centroid" -> (es => StCentroid(es.head)),
    "st_buffer_m" -> (es => StBufferMeters(es(0), es(1))),
    "st_distance_m" -> (es => StDistanceMeters(es(0), es(1))))

  /** Register the ST family on an existing session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/**
 * SparkSessionExtensions installer:
 * `SparkSession.builder().withExtensions(new GraftExtensions)` — injects the
 * ST function family into every session built with it.
 */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GeoExpressions.registry.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft.geo.GeoExpressions", name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.SpatialJoinStrategy)
  }
}
