package graft

import graft.queries.Catalog

/** Physical-plan shape guards: the properties that decide 100 TB
  * behavior must not silently regress — broadcast for dim joins,
  * predicate pushdown + column pruning at the scan, whole-stage codegen
  * in the hot paths, no cartesian products where a broadcast was
  * intended.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    Catalog.all(name).build(spark, sf()).queryExecution.executedPlan.toString

  test("q03 dim join broadcasts the customer side") {
    assert(plan("q03_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q04 fact-fact join is sort-merge (not broadcast at scale)") {
    assert(plan("q04_join_sortmerge").contains("SortMergeJoin"))
  }

  test("q02 filter is pushed to the parquet scan and columns pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)")
      || p.contains("EqualTo(l_returnflag,R)"))
    // projection needs 5 columns; a full-width scan would list all 16
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
  }

  test("q01 aggregation runs inside whole-stage codegen") {
    // AQE reveals codegen spans only in the final (executed) plan
    val df = Catalog.all("q01_agg").build(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Operator" in the simple plan string
    assert(p.contains("*(1) HashAggregate") || p.contains("*(2) HashAggregate"))
  }

  test("q08/q38 theta joins broadcast the literal band side") {
    assert(plan("q08_theta_join").contains("BroadcastNestedLoopJoin"))
    assert(plan("q38_range_join").contains("BroadcastNestedLoopJoin"))
  }

  test("q17 global top-k is TakeOrderedAndProject, not a full sort") {
    assert(plan("q17_topk_global").contains("TakeOrderedAndProject"))
  }

  test("q50 native cosine appears in the plan (no interpreted HOF in ANN path)") {
    val p = plan("q50_ann_brute")
    assert(p.contains("graft_cosine"))
    assert(!p.contains("zip_with"))
  }
}
