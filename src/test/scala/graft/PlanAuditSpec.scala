package graft

/** Plan-shape audit over the real query inventory: the physical-plan
  * properties that make each query survive a 100× scale-up, asserted on
  * the plan string so a regression fails loudly instead of silently
  * degrading into extra shuffles or nested loops.
  *
  * These run at sf0.001 but assert SHAPE, not timing — the shapes are
  * scale-invariant (explicit broadcast hints, pushed filters, partial
  * aggregation, bucketed-equi rewrites are all decided before data volume
  * matters).
  */
class PlanAuditSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // formatted mode: scan details (PushedFilters / ReadSchema) are printed
  // in full; the tree-mode toString elides them mid-list
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q01: shipdate filter is pushed to the parquet scan; map-side combine") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter must reach the scan:\n$p")
    assert(p.contains("partial_sum"), s"expected partial aggregation below the exchange:\n$p")
  }

  test("q02: predicate AND projection both reach the scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_discount"),
      s"filters must reach the scan:\n$p")
    // pruned read schema: none of the untouched lineitem columns are read
    assert(!p.contains("l_comment") && !p.contains("l_returnflag"),
      s"scan must prune unused columns:\n$p")
  }

  test("q04: every dim join is a broadcast join; the fact table is never shuffled pre-agg") {
    val p = plan("q04_star_broadcast")
    // formatted mode lists each operator in the tree AND a detail section:
    // 3 joins appear ≥ 3 times; the exact operator set is pinned by the
    // no-SortMergeJoin assert below
    assert(p.split("BroadcastHashJoin").length - 1 >= 3,
      s"expected 3 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no sort-merge join for dims:\n$p")
  }

  test("q12: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q12_global_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q29: last-value-per-key shuffles partial max_by aggregates, no window sort") {
    val p = plan("q29_last_per_key")
    assert(p.contains("partial_max_by"),
      s"shuffle must carry one row per key per partition:\n$p")
    assert(!p.contains("Window"), s"no window sort of the full input:\n$p")
  }

  test("q34: the MinHash-LSH pipeline contains no cartesian or nested-loop join") {
    val p = plan("q34_minhash_lsh_pairs")
    assert(!p.contains("CartesianProduct"), s"no cross product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no nested loop:\n$p")
  }

  test("q49: the range join is a bucketed equi-join, not a nested loop") {
    val p = plan("q49_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must rewrite to an equi-join:\n$p")
  }

  test("q40: brute-force ANN broadcasts the query side; corpus scans once unshuffled") {
    val p = plan("q40_ann_topk")
    // the only join is corpus × broadcast(queries) — a broadcast join with
    // the non-equi self-exclusion condition; the corpus is never exchanged
    // before scoring
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle to join:\n$p")
  }
}
