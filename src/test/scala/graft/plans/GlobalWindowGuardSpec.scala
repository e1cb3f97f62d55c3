package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, Window => LWindow}

/**
 * Board-wide scale guard: NO partition-less Window may sit over an
 * unbounded table anywhere in the query board. A `Window.orderBy(...)`
 * with no partitionBy moves the ENTIRE input through a single task —
 * fine on a P-row offset table or a 64-row bucket summary, a
 * cluster-killer on a 10⁸–10⁹-row vocabulary or document table. The
 * scale-safe replacement is [[graft.ops.GlobalRank]] (range partitions +
 * broadcast offset table).
 *
 * Two layers, because localCheckpoint cuts executed subtrees out of the
 * final logical plan (a single-task window hidden behind a checkpoint is
 * invisible to plan inspection):
 *   1. an optimized-plan walk over every batch query on the board,
 *      allowing a partition-less Window only when its input is provably
 *      bucket-bounded;
 *   2. a source-level audit pinning every `Window.orderBy` call site in
 *      `src/main` to a reviewed allowlist.
 */
class GlobalWindowGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Columns that mark a bounded-by-construction aggregate domain:
    * `__gr_pid` is a spark partition id (≤ parallelism rows) and `__b` is
    * the repo-wide convention for a fixed-fan bucket index (Skyline's
    * ≤`buckets` cells, d45's md5 fold buckets). An Aggregate grouped
    * ONLY on these produces a small table a single-task window may sort. */
  private val boundedMarkers = Set("__gr_pid", "__b")

  private def bounded(p: LogicalPlan): Boolean = {
    var ok = false
    p.foreach {
      case a: Aggregate
          if a.groupingExpressions.nonEmpty &&
            a.groupingExpressions.forall(
              _.references.forall(r => boundedMarkers(r.name))) =>
        ok = true
      case _: GlobalLimit => ok = true
      case _ =>
    }
    ok
  }

  test("no batch query plans a partition-less Window over an unbounded input") {
    // NO exemptions: q68's ntile, the last one, now runs through
    // GlobalRank.withGlobalNtile (round 13) — the invariant is board-wide.
    // s* queries run Structured Streaming inside their builders (minutes
    // of wall clock); their stateful aggregations never use WindowExec.
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => n.startsWith("s"))
    val bad = names.flatMap { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      val viol = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty && !bounded(w.child) => w
      }
      if (viol.isEmpty) None
      else Some(s"$n: ${viol.size} single-task Window(s) — use ops.GlobalRank")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("every Window.orderBy call site in src/main is on the reviewed allowlist") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    // reviewed sites: file -> expected count of NON-COMMENT occurrences.
    //   GlobalRank.scala  — the P-row offset-table window (the pattern itself)
    //   Skyline.scala     — cumulative min over the ≤`buckets`-row summary
    val allow = Map(
      "GlobalRank.scala" -> 1,
      "Skyline.scala" -> 1)
    val found = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val code = java.nio.file.Files.readAllLines(p).asScala
          .filterNot { l =>
            val t = l.trim
            t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
          }
        val n = code.count(_.contains("Window.orderBy"))
        if (n > 0) Some(p.getFileName.toString -> n) else None
      }.toMap
    assert(found == allow,
      s"Window.orderBy sites drifted from the allowlist.\n  found=$found\n  allow=$allow\n" +
        "A new partition-less window must be audited for bounded input " +
        "(or replaced with ops.GlobalRank) and added here.")
  }

  test("withGlobalNtile is bit-identical to the window ntile (uneven, even, tiny)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    // (N, buckets): uneven split (23 % 10 = 3 big buckets), exact split,
    // and more buckets than rows (bucket = rank)
    Seq((23, 10), (40, 8), (5, 10)).foreach { case (n, b) =>
      val df = (1 to n).map(i => ((i * 37) % 100 + i / 100.0, i.toLong))
        .toDF("value", "event_id")
      val want = df.select($"event_id",
          ntile(b).over(W.orderBy($"value", $"event_id")).as("t"))
        .as[(Long, Int)].collect().sorted
      val got = graft.ops.GlobalRank.withGlobalNtile(df, "t", b,
          $"value", $"event_id")
        .select($"event_id", $"t").as[(Long, Int)].collect().sorted
      assert(got.sameElements(want), s"ntile mismatch at N=$n buckets=$b")
    }
  }
}
