package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph primitives over edge-list DataFrames (columns
 * `src`/`dst`), the shapes a dedup/link-analysis pipeline needs beyond
 * [[ConnectedComponents]].
 *
 * Triangle counting uses the degree-orientation algorithm (Suri & Vassilvitskii,
 * "Counting Triangles and the Curse of the Last Reducer", WWW'11): orient
 * every undirected edge from the lower-degree endpoint to the higher
 * (ties by id), then count directed wedges closed by an oriented edge.
 * Each wedge is generated at its lowest-degree vertex, so per-vertex work
 * is O(d_min²) — the hub that would make the naive self-join quadratic
 * generates NO wedges. Two shuffles (degree join, wedge-close join), both
 * equi-joins on vertex/edge keys — AQE-splittable, no all-pairs.
 */
object Graph {

  /** Canonical undirected edge set: dedup, drop self-loops, src < dst. */
  def canonicalEdges(edges: DataFrame): DataFrame = {
    val e = edges.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
    e.filter(col("src") < col("dst")).distinct()
  }

  /** Total triangle count of the undirected graph. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges)
    val deg = canon.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient from lower (deg, id) to higher (deg, id)
    val withDeg = canon
      .join(deg.withColumnRenamed("v", "src").withColumnRenamed("deg", "deg_src"), Seq("src"))
      .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("deg", "deg_dst"), Seq("dst"))
    val oriented = withDeg.select(
      when(col("deg_src") < col("deg_dst") ||
        (col("deg_src") === col("deg_dst") && col("src") < col("dst")),
        struct(col("src").as("lo"), col("dst").as("hi")))
        .otherwise(struct(col("dst").as("lo"), col("src").as("hi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    // wedges at the low vertex: (lo)->(a), (lo)->(b) with a<b, closed by a->b or b->a;
    // oriented edges stored canonically ordered by (deg,id), so close on the
    // canonical (min,max) form of (a,b)
    val w1 = oriented.select(col("lo"), col("hi").as("a"))
    val w2 = oriented.select(col("lo"), col("hi").as("b"))
    val wedges = w1.join(w2, Seq("lo")).filter(col("a") < col("b"))
    val closing = oriented.select(
      least(col("lo"), col("hi")).as("a"), greatest(col("lo"), col("hi")).as("b"))
    wedges.join(closing, Seq("a", "b"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
