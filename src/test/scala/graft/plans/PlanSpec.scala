package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.ExplainMode

/**
 * Plan-shape regression guards: the scale properties PERF.md documents
 * (pushdown, column pruning, broadcast dimension joins, shuffle counts)
 * asserted against the real sf0.001 parquet, so a refactor that silently
 * degrades a plan fails the suite instead of only the next bench review.
 * Planning only — nothing here executes a job.
 */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Formatted explain prints each node twice (tree line + detail header);
    * count only the `(n) Exchange` detail headers. */
  private def exchangeCount(p: String): Int =
    """\(\d+\) Exchange""".r.findAllIn(p).size

  test("q02: filters are pushed to the parquet scan and columns pruned") {
    val p = formatted("q02_filter_project")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,48"), p)
    assert(p.contains("GreaterThan(l_discount,0.07"), p)
    // the 16-column lineitem scan must read only the 5 needed columns
    assert(!p.contains("l_comment"), "scan reads unprojected column:\n" + p)
    assert(!p.contains("l_shipmode"), "scan reads unprojected column:\n" + p)
  }

  test("q05: dimension joins broadcast; no sort-merge join") {
    val p = formatted("q05_dim_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q81: 3-way top-k broadcasts the dimension side, pushes the segment filter, plans top-k") {
    val p = formatted("q81_sql_3way_topk")
    // customer (the selective dimension side) must broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    // the segment filter reaches the customer parquet scan
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    // ORDER BY + LIMIT plans as top-k, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    // no decorrelation/join fallback to a nested loop
    assert(!p.contains("NestedLoop"), p)
  }

  test("q82: EXISTS/NOT EXISTS over the 4-way join decorrelate to semi/anti equi-joins") {
    val p = formatted("q82_sql_4way_exists")
    assert(p.contains("LeftSemi"), "EXISTS must plan as a left-semi join:\n" + p)
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as a left-anti join:\n" + p)
    // all four base joins + both subquery joins are equi-joins — a
    // nested-loop anywhere means decorrelation failed and the plan is
    // O(n^2) at scale
    assert(!p.contains("NestedLoop"), p)
    // nation (4-row dimension) broadcasts
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q92: correlated scalar MIN decorrelates to an aggregated equi-join, dims broadcast") {
    val p = formatted("q92_sql_scalar_min")
    // the scalar subquery must rewrite to an aggregate joined on
    // p_partkey — a nested-loop anywhere means per-part re-execution
    assert(!p.contains("NestedLoop"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the region-name filter reaches the region parquet scan
    assert(p.contains("EqualTo(r_name,EUROPE)"), p)
    // the p_size filter reaches the part scan
    assert(p.contains("LessThan(p_size,15)"), p)
  }

  test("q100: both correlated scalar aggs merge into ONE outer-joined aggregate pass") {
    val p = formatted("q100_sql_scalar_avg")
    // decorrelation failure re-executes the fact aggregate per outer row
    assert(!p.contains("NestedLoop"), p)
    // MergeScalarSubqueries: the COUNT and SUM subqueries over the same
    // correlated lineitem slice must share ONE aggregate, joined back as
    // ONE LeftOuter — two would mean two full fact passes
    val outers = """Join type: LeftOuter""".r.findAllIn(p).size
    assert(outers == 1, s"expected 1 merged scalar-subquery join, got $outers:\n$p")
    // the p_size filter reaches the part scan
    assert(p.contains("LessThan(p_size,10)"), p)
  }

  test("q101: the nested IN chain plans as left-semi equi-joins, name filter pushed") {
    val p = formatted("q101_sql_nested_in")
    assert(!p.contains("NestedLoop"), p)
    // outer IN + inner IN both decorrelate to left-semi hash joins
    val semis = """Join type: LeftSemi""".r.findAllIn(p).size
    assert(semis >= 2, s"expected >=2 left-semi joins, got $semis:\n$p")
    // the LIKE 'small%' prefix reaches the part parquet scan
    assert(p.contains("StringStartsWith(p_name,small)"), p)
  }

  test("q103: Q7-shape 6-table join — dims broadcast, date range pushed, no nested loop") {
    val p = formatted("q103_sql_volume_shipping")
    assert(!p.contains("NestedLoop"), p)
    // supplier/customer/nation sides all broadcast against the fact
    val bhj = """BroadcastHashJoin""".r.findAllIn(p).size
    assert(bhj >= 4, s"expected >=4 broadcast joins in the 6-table chain, got $bhj:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "a dim join fell back to sort-merge:\n" + p)
    // the shipdate range reaches the lineitem parquet scan
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q104: Q8-shape 8-table join — region/type filters pushed, all dims broadcast") {
    val p = formatted("q104_sql_market_share")
    assert(!p.contains("NestedLoop"), p)
    assert(!p.contains("SortMergeJoin"),
      "a dim join fell back to sort-merge:\n" + p)
    val bhj = """BroadcastHashJoin""".r.findAllIn(p).size
    assert(bhj >= 6, s"expected >=6 broadcast joins in the 8-table chain, got $bhj:\n$p")
    // the selective dim filters reach their parquet scans
    assert(p.contains("EqualTo(r_name,ASIA)"), p)
    assert(p.contains("EqualTo(p_type,PROMO)"), p)
    // the order-date range reaches the orders scan
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
  }

  test("d92: the weight table broadcasts into the feature join; one doc_id shuffle") {
    val p = formatted("d92_linear_quality")
    // a 4096-row model must BROADCAST — shuffling the exploded token
    // stream against it would move the corpus to move the model
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("NestedLoop"), p)
    // exactly one aggregation exchange (by doc_id); the explode + join
    // stay map-side
    assert(exchangeCount(p) <= 3, s"too many exchanges:\n$p")
  }

  test("d66: the perplexity model joins broadcast; folds stay per-doc (one doc_id shuffle)") {
    val p = formatted("d66_lm_perplexity")
    // the vocab-bounded KN model must broadcast into the scoring join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("NestedLoop"), p)
  }

  test("d67: the blocklist automaton stays inside whole-stage codegen (no UDF boundary)") {
    val p = formatted("d67_blocklist")
    assert(p.contains("aho_first"), p)
    assert(p.contains("aho_count"), p)
    // both expressions are native Catalyst nodes with doGenCode — a
    // BatchEvalPython/ScalaUDF wrapper means the automaton fell out of
    // codegen and pays a per-row boundary
    assert(!p.contains("ScalaUDF"), p)
    // one narrow pass: no exchange before the final sort
    assert(exchangeCount(p) <= 1, p)
  }

  test("v13: the metadata predicate reaches the parquet scan BEFORE any vector work") {
    val p = formatted("v13_ann_filtered")
    // pre-filtering: the candidate stripe prunes at the scan, so the
    // n x q scoring never sees non-matching vectors
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("IsNotNull(label)") || p.contains("label"), p)
    assert(!p.contains("NestedLoop") || p.contains("BroadcastNestedLoop"), p)
  }

  test("q83: grouping sets plan as ONE Expand + aggregate, not three unioned scans") {
    val p = formatted("q83_grouping_sets")
    assert(p.contains("Expand"), "grouping sets must plan via Expand:\n" + p)
    assert(!p.contains("Union"), "multi-granularity agg must not re-scan per set:\n" + p)
    // orders is scanned exactly once
    assert("orders\\.parquet".r.findAllIn(p).size <= 2, // scan node + its detail line
      "orders scanned more than once:\n" + p)
  }

  test("q86: set ops plan as semi/anti hash joins; INTERSECT ALL replicates rows, no nested loop") {
    val p = formatted("q86_sql_setops")
    assert(p.contains("LeftSemi"), "INTERSECT must plan as a left-semi join:\n" + p)
    assert(p.contains("LeftAnti"), "EXCEPT must plan as a left-anti join:\n" + p)
    // INTERSECT ALL rewrites to a counted union + ReplicateRows generate —
    // one pass over each input, never a join per duplicate
    assert(p.contains("ReplicateRows") || p.contains("Generate"),
      "INTERSECT ALL must use the replicate-rows rewrite:\n" + p)
    assert(!p.contains("NestedLoop"), p)
  }

  test("q87: the LATERAL top-3 decorrelates to a ranked equi-join — no per-row subquery") {
    val p = formatted("q87_sql_lateral")
    // the ORDER BY + LIMIT inside the lateral becomes a window rank (or
    // per-key limit) over ONE scan of orders, joined back on custkey
    assert(p.contains("Window") || p.contains("Limit"),
      "lateral LIMIT must decorrelate to a ranked/limited join:\n" + p)
    assert(!p.contains("NestedLoop"),
      "a nested-loop means decorrelation failed (O(customers × orders) at scale):\n" + p)
    // the segment filter reaches the customer parquet scan
    assert(p.contains("EqualTo(c_mktsegment,MACHINERY)"), p)
  }

  test("d60: URL canonicalization is a narrow codegen projection — one shuffle total") {
    val p = formatted("d60_url_canonical")
    // the whole normalization chain must stay inside the scan->project
    // pipeline: the ONLY exchanges are the canonical-key aggregation and
    // the output sort
    val exchanges = exchangeCount(p)
    assert(exchanges <= 2, s"expected <=2 Exchange, found $exchanges:\n$p")
    // no UDF boundary anywhere — regexp/filter/sort_array are built-ins
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "canonicalization fell out of codegen:\n" + p)
  }

  test("d59: the eval signature side broadcasts — no corpus-corpus sort-merge join") {
    val p = formatted("d59_fuzzy_decontam")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "the (k, sig) probe must broadcast the small eval side:\n" + p)
  }

  test("q85: the neighbour windows stack over ONE key-partitioned sort") {
    val p = formatted("q85_gapfill_interpolate")
    // observed plan: daily-agg Exchange + spine-agg Exchange (spine side
    // then BROADCASTS into the dense join) + one output-sort Exchange =
    // 3. The window nodes (two frames split into <=3 nodes by Spark)
    // stack directly over a single Sort with NO exchange between them —
    // any re-partitioning between windows pushes the count past 4 and
    // fails here
    val exchanges = exchangeCount(p)
    assert(exchanges <= 4, s"expected <=4 Exchange, found $exchanges:\n$p")
    val windows = """\(\d+\) Window""".r.findAllIn(p).size
    assert(windows <= 3, s"window pass split into $windows nodes:\n$p")
    // the spine side must broadcast (per-key min/max rows are tiny)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    val p = formatted("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), "no partial aggregation before exchange:\n" + p)
  }

  test("g01: tile probability plan has at most the output-sort shuffle") {
    val p = formatted("g01_tile_probability")
    val exchanges = exchangeCount(p)
    assert(exchanges <= 1, s"expected <=1 Exchange, found $exchanges:\n$p")
  }

  test("q09: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = formatted("q09_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("g02: CCI computes all bands in one window + one groupBy (2 shuffles)") {
    val p = formatted("g02_cci")
    val exchanges = exchangeCount(p)
    assert(exchanges <= 2, s"expected <=2 Exchange, found $exchanges:\n$p")
  }

  test("d06: langid scoring stays narrow until the final grouped count") {
    val p = formatted("d06_langid")
    // one shuffle for the groupBy, one for the output sort — the per-row
    // tokenize/score pipeline itself must not shuffle
    val exchanges = exchangeCount(p)
    assert(exchanges <= 2, s"expected <=2 Exchange, found $exchanges:\n$p")
  }

  test("q30: sessionize reuses one user_id exchange across window + groupBy") {
    val p = formatted("q30_sessionize")
    // hashpartitioning(user_id) satisfies the (user_id, session_seq) groupBy
    // distribution, so the only exchanges are the key shuffle + output sort
    val exchanges = exchangeCount(p)
    assert(exchanges <= 2, s"expected <=2 Exchange, found $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q31: as-of join is union + one window pass, never a per-key cross product") {
    val p = formatted("q31_asof_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), "asof must not plan a join at all:\n" + p)
    assert(p.contains("Window"), p)
  }

  test("q32: binned range join plans as an equi-join, not a nested loop") {
    val p = formatted("q32_range_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("d11: hash sampling is a pushed-down narrow filter (zero exchanges)") {
    val p = formatted("d11_hash_sample")
    // output sort is the only allowed exchange
    val exchanges = exchangeCount(p)
    assert(exchanges <= 1, s"expected <=1 Exchange, found $exchanges:\n$p")
  }

  test("d13: repetition metrics shuffle only on doc_id (explode-side aggs)") {
    val p = formatted("d13_repetition")
    assert(!p.contains("CartesianProduct"), p)
    // explode -> (doc, token) agg -> doc agg -> join back -> sort: the
    // narrow array-ratio side must not add more exchanges
    val exchanges = exchangeCount(p)
    assert(exchanges <= 5, s"expected <=5 Exchange, found $exchanges:\n$p")
  }

  test("d04: LSH self-join sides are narrow checkpoint scans, never cached fat rows") {
    // The bucketed frame is deliberately NOT .cache()d: columnar-caching
    // rows with an array<bigint>(64) signature column pays per-element
    // encoding (~25x the UDF recompute — see PERF.md round 6). Instead the
    // sig-free (id, band, bucket) rows materialize once via localCheckpoint
    // and BOTH sides of the pair self-join scan that RDD; signatures join
    // back only to the output-bound candidate pairs.
    val plan = graft.SparkEntry.queries("d04_minhash_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"),
      s"fat-row cache crept back into the LSH pair join:\n$plan")
    val rddScans = "Scan ExistingRDD".r.findAllIn(plan).size
    assert(rddScans >= 2,
      s"expected the checkpointed narrow bucket rows on both self-join sides:\n$plan")
  }

  test("d17: chunk-span generation stays narrow (explode, no data shuffle)") {
    val p = formatted("d17_chunk_spans")
    val exchanges = exchangeCount(p)
    assert(exchanges <= 1, s"expected <=1 Exchange (output sort only), found $exchanges:\n$p")
    assert(p.contains("Generate"), p)
  }

  test("q33: exact percentiles aggregate partially before the shuffle") {
    val p = formatted("q33_percentiles")
    assert(p.contains("partial_"), "no partial aggregation before exchange:\n" + p)
  }

  test("v01: the ANN top-k window input is narrow — vectors never reach the sort shuffle") {
    // the scored n×q set reaches the top-k window as (query_id, neighbor_id,
    // cosine); at 1M docs × 100 queries the fat alternative shuffles ~50 GB
    // of vectors for ~2.4 GB of narrow rows (PERF.md round 6)
    val p = formatted("v01_ann_bruteforce")
    val windowInputs = """\(\d+\) Window\s*\nInput \[\d+\]: \[([^\]]*)\]""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(windowInputs.nonEmpty, s"no Window node found:\n$p")
    windowInputs.foreach { in =>
      assert(!in.contains("__qv") && !in.contains("__cv"),
        s"vectors reached the top-k window input: $in")
    }
  }

  test("d26: exact cosine pairs plan has no nested-loop join (broadcast-array scoring)") {
    // the rewrite scores each row against the broadcast primitive-array
    // corpus inside one UDF — a BroadcastNestedLoopJoin reappearing here
    // means someone reverted to the materialize-n²/2-rows plan
    val p = formatted("d26_semantic_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "exact-cosine path regressed to a nested-loop join:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q54: skyline is bucket-keyed windows + broadcast merge, never O(n²)") {
    val p = formatted("q54_skyline")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "skyline regressed to the quadratic dominance join:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      "cross-bucket cumulative-min merge should broadcast:\n" + p)
  }

  test("q56: rational OLS is one partial-aggregated pass — no window, no second scan") {
    val p = formatted("q56_trend")
    assert(p.contains("partial_"), "no map-side combine before the shuffle:\n" + p)
    assert(!p.contains("Window"), "trend must not need a window:\n" + p)
  }

  test("q60: snapshot diff is a single full-outer key join, never a nested loop") {
    val p = formatted("q60_snapshot_diff")
    assert(p.contains("FullOuter"), "diff lost its full outer join:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert("""\(\d+\) SortMergeJoin""".r.findAllIn(p).size +
      """\(\d+\) ShuffledHashJoin""".r.findAllIn(p).size <= 1,
      "diff should read each snapshot once through ONE keyed join:\n" + p)
  }

  test("d37: importance top-k ends in TakeOrderedAndProject with a broadcast stats join") {
    val p = formatted("d37_importance_rank")
    assert(p.contains("TakeOrderedAndProject"), "top-k regressed to a global sort:\n" + p)
    assert(p.contains("BroadcastHashJoin"), "bucket stats should broadcast:\n" + p)
  }

  test("d40: span dedup is explode + keyed aggs — no nested loop, bounded shuffles") {
    val p = formatted("d40_span_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val exchanges = exchangeCount(p)
    // chunk-key agg, join-back, id-key rebuild, output sort (+AQE variance)
    assert(exchanges <= 5, s"expected <=5 Exchange, found $exchanges:\n$p")
  }

  test("d43: linkage scoring attaches both record sides without a cartesian blow-up") {
    val p = formatted("d43_linkage_scores")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "field attachment must be an equi-join:\n" + p)
  }

  test("d44: containment self-join is gram-keyed, never all-pairs") {
    val p = formatted("d44_source_containment")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), "gram counts must combine map-side:\n" + p)
  }

  test("join strategy hints are honored: broadcast / shuffle_hash / merge") {
    // the §2.3 escape hatch when stats mislead Catalyst: each hint must
    // actually change the physical join, not silently no-op
    val sf001 = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$sf001/orders.parquet")
    val c = spark.read.parquet(s"$sf001/customer.parquet")
    def plan(j: org.apache.spark.sql.DataFrame) = j.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val b = plan(o.join(c.hint("broadcast"), o("o_custkey") === c("c_custkey")))
    assert(b.contains("BroadcastHashJoin"), b)
    val sh = plan(o.join(c.hint("shuffle_hash"), o("o_custkey") === c("c_custkey")))
    assert(sh.contains("ShuffledHashJoin"), sh)
    val m = plan(o.join(c.hint("merge"), o("o_custkey") === c("c_custkey")))
    assert(m.contains("SortMergeJoin"), m)
  }

  test("q53: KMV sketch windows are salted — no unsalted single pass over a shard") {
    // the first min-k window must partition on (shard, __salt); an
    // orderBy-only or shard-only first window funnels a hot shard's whole
    // distinct set through one task
    val p = formatted("q53_kmv_overlap")
    assert(p.contains("__salt"), "salted pre-selection window missing:\n" + p)
  }

  test("d51/d55: native text expressions plan as Catalyst nodes, no UDF boundary") {
    // the kernel must appear as its expression name inside a plain
    // Project — a ScalaUDF/BatchEvalPython node would mean it fell off
    // the codegen path (the whole point of the Catalyst expressions)
    for ((q, fn) <- Seq("d51_normalize_text" -> "normalize_text",
                        "d55_jaro_winkler" -> "jaro_winkler")) {
      val p = formatted(q)
      assert(p.contains(fn), s"$q: expression $fn not in the plan:\n$p")
      assert(!p.contains("BatchEvalPython") && !p.contains("UDF"),
        s"$q evaluates through a UDF boundary:\n$p")
    }
  }

  test("d45: the entropy fold aggregates twice (bucket level then group level) — bounded buffers") {
    // the round-8 two-level fold: a single whole-vocabulary collect_list
    // plans ONE objectHashAggregate pair keyed on (source); the bounded
    // version must show the intermediate (source, __bk)-keyed aggregate
    val p = formatted("d45_source_entropy")
    assert(p.contains("__bk"), "md5-bucket fold key missing — whole-vocab buffer is back:\n" + p)
  }
}
