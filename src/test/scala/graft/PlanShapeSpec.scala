package graft

/** Physical-plan assertions for the scale claims the new operators make:
  * where a Scaladoc says "broadcast, no exchange on the big side" or
  * "equi-join, not a theta join", the executed plan is held to it.
  */
class PlanShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("triangle count probes the closing-edge set via broadcast hash join") {
    val plan = executedPlan("q100_triangle_count")
    // the closing-edge probe must be a broadcast hash join; the final
    // single-row stat combine is allowed to be a (1×1×1) nested-loop cross
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
    assert(!plan.contains("CartesianProduct"), plan.take(4000))
  }

  test("binned interval join plans as an equi-join, never a theta join") {
    val plan = executedPlan("q101_interval_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
  }

  test("Bloom probe joins the broadcast bit set, no shuffle of positions") {
    val plan = executedPlan("q106_bloom_semijoin")
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
  }

  test("skyline joins the broadcast staircase, no quadratic join") {
    val plan = executedPlan("q104_skyline")
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
  }

  test("k-core peel filters edges via broadcast joins, never a theta join") {
    val plan = executedPlan("q152_kcore")
    // the per-round census combine is a (1×1) nested-loop cross — benign;
    // the |E|-touching joins must all be broadcast hash joins
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
    assert(!plan.contains("CartesianProduct"), plan.take(4000))
  }

  test("item-item CF broadcasts item counts and keeps the cohort join narrow") {
    val plan = executedPlan("q157_itemcf_recommend")
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
    assert(!plan.contains("CartesianProduct"), plan.take(4000))
  }

  test("BM25 pushes the query-term filter into the scan side of tf") {
    val df = SparkEntry.queries("q146_bm25")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // corpus stats and df join as broadcasts; no quadratic fallback
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
    assert(!plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
  }

  test("set-similarity join verifies candidates with equi-joins only") {
    val plan = executedPlan("q154_setsim_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
  }

  test("grid distance join is an equi-join on cells, never a theta join") {
    val plan = executedPlan("q184_grid_distance_join")
    // 9-cell probe explode + hash join on (cx, cy); the single-row
    // aggregate output has no join at all downstream
    assert(plan.contains("explode"), plan.take(4000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
  }

  test("sorted-neighborhood candidates come from a hash join on rank, not a range join") {
    val plan = executedPlan("q194_sorted_neighborhood")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
  }

  test("association rules broadcast the marginals onto the pair counts") {
    val plan = executedPlan("q181_assoc_rules")
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
    assert(!plan.contains("CartesianProduct"), plan.take(4000))
  }

  test("adamic-adar expands wedges map-side and anti-joins edges by hash") {
    val plan = executedPlan("q197_adamic_adar")
    assert(plan.contains("explode"), plan.take(4000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
  }

  test("item-CF computes directed sims once (no self-union re-execution)") {
    val df = SparkEntry.queries("q157_itemcf_recommend")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the both-directions table is one explode over the aggregated pair
    // counts — a Union of two pair-count pipelines would show two
    // identical HashAggregate(keys=[i, j]) branches
    assert(plan.contains("explode"), plan.take(4000))
  }
}
