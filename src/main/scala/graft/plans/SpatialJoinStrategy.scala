package graft.plans

import graft.geo.{Geo, GeoExpressions}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.locationtech.jts.index.strtree.STRtree

/**
 * Planner integration for spatial joins (SURVEY.md §4 "custom join
 * strategy"): an inner join whose condition is `st_intersects(a, b)` (the
 * native expression from [[GeoExpressions]]) is planned as
 * [[BroadcastSpatialJoinExec]] — the smaller side is collected, broadcast,
 * and indexed with an STRtree per executor thread; the streamed side probes
 * the index per row. Without this, Catalyst can only pick
 * BroadcastNestedLoopJoin, which evaluates the predicate (deserializing
 * both WKB geometries) for every row pair; the indexed exec prunes
 * candidates by envelope first and reuses prepared geometries.
 *
 * Activate on a live session with
 * `spark.experimental.extraStrategies = Seq(SpatialJoinStrategy)`
 * or for all sessions via [[graft.geo.GraftExtensions]].
 */
object SpatialJoinStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), _) =>
      // supported predicates; each maps to "does broadcast-side geometry RG
      // relate to streamed-side geometry LG". For st_within(a, b): a within
      // b ≡ b contains a, so the containment test flips with operand order.
      val matched: Option[(Expression, Expression, SpatialPredicate)] = cond match {
        case GeoExpressions.StIntersects(a, b) => Some((a, b, IntersectsPred))
        case GeoExpressions.StContains(a, b) => Some((a, b, ContainsPred))
        case GeoExpressions.StWithin(a, b) => Some((a, b, WithinPred))
        case _ => None
      }
      matched.toSeq.flatMap { case (a, b, pred) =>
        if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
          BroadcastSpatialJoinExec(planLater(left), planLater(right), a, b, pred) :: Nil
        else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
          BroadcastSpatialJoinExec(planLater(left), planLater(right), b, a, pred.flipped) :: Nil
        else Nil
      }
    case _ => Nil
  }
}

/** How the broadcast side's prepared geometry relates to a streamed probe.
  * `eval(prepared_broadcast_geom, streamed_geom)`. */
sealed trait SpatialPredicate extends Serializable {
  def eval(b: org.locationtech.jts.geom.prep.PreparedGeometry,
           s: org.locationtech.jts.geom.Geometry): Boolean
  def flipped: SpatialPredicate
}
case object IntersectsPred extends SpatialPredicate {
  def eval(b: org.locationtech.jts.geom.prep.PreparedGeometry,
           s: org.locationtech.jts.geom.Geometry): Boolean = b.intersects(s)
  def flipped: SpatialPredicate = this
}
/** original condition was st_contains(streamed, broadcast)… after operand
  * swap this evaluates broadcast-within-streamed = streamed contains broadcast. */
case object ContainsPred extends SpatialPredicate {
  // condition st_contains(L, R): streamed L contains broadcast R
  def eval(b: org.locationtech.jts.geom.prep.PreparedGeometry,
           s: org.locationtech.jts.geom.Geometry): Boolean = b.within(s)
  def flipped: SpatialPredicate = WithinPred
}
case object WithinPred extends SpatialPredicate {
  // condition st_within(L, R): streamed L within broadcast R
  def eval(b: org.locationtech.jts.geom.prep.PreparedGeometry,
           s: org.locationtech.jts.geom.Geometry): Boolean = b.contains(s)
  def flipped: SpatialPredicate = ContainsPred
}

/**
 * Broadcast spatial inner join: builds (collects + broadcasts) the RIGHT
 * side, streams the left. Right side must be the small one — the storm
 * pipeline's envelope/admin dimensions always are. Index is built once per
 * executor thread (STRtree + prepared geometries), probes are
 * envelope-pruned before the exact JTS test.
 */
case class BroadcastSpatialJoinExec(left: SparkPlan, right: SparkPlan,
                                    leftGeom: Expression, rightGeom: Expression,
                                    predicate: SpatialPredicate = IntersectsPred)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val boundR = BindReferences.bindReference(rightGeom, right.output)
    val rightRows: Array[(Array[Byte], Array[Byte])] = right.executeCollect().map { row =>
      val g = boundR.eval(row).asInstanceOf[Array[Byte]]
      // keep rows as serialized copies; UnsafeRow.copy().getBytes is not
      // directly portable, so re-project to unsafe and copy
      (UnsafeProjection.create(right.output, right.output)(row).copy().getBytes, g)
    }
    val rightSchema = right.output
    val bc = sparkContext.broadcast(rightRows)
    val tl = new graft.util.ThreadLocalCache[(STRtree, Array[(InternalRow, org.locationtech.jts.geom.prep.PreparedGeometry)])](() => {
      val rows = bc.value.map { case (bytes, g) =>
        val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(rightSchema.size)
        r.pointTo(bytes, bytes.length)
        val geom = if (g == null) null
          else org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(Geo.fromWkb(g))
        (r: InternalRow, geom)
      }
      val tree = new STRtree()
      rows.zipWithIndex.foreach { case ((_, pg), i) =>
        if (pg != null) tree.insert(pg.getGeometry.getEnvelopeInternal, Integer.valueOf(i))
      }
      tree.build()
      (tree, rows)
    })

    val leftOut = left.output
    val allOut = output
    left.execute().mapPartitions { iter =>
      val boundL = BindReferences.bindReference(leftGeom, leftOut)
      val (tree, rows) = tl.get
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(allOut, allOut)
      iter.flatMap { lrow =>
        val gBytes = boundL.eval(lrow).asInstanceOf[Array[Byte]]
        if (gBytes == null) Iterator.empty
        else {
          val g = Geo.fromWkb(gBytes)
          import scala.jdk.CollectionConverters._
          tree.query(g.getEnvelopeInternal).asScala.iterator
            .map(_.asInstanceOf[Integer].intValue)
            .filter(i => predicate.eval(rows(i)._2, g))
            .map(i => proj(joined(lrow, rows(i)._1)))
        }
      }
    }
  }
}
