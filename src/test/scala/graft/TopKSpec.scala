package graft

import org.apache.spark.sql.functions._

/** graft_topk bounded-heap aggregate: ordering, tie-break, k-bound, and
  * the merge path (forced through repartition so partial buffers must
  * combine correctly).
  */
class TopKSpec extends SparkSuite {

  test("top-k ordering, tie-break by smaller id, k-bound") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 3L), (1L, 0.8, 7L), (1L, 0.95, 2L), (1L, 0.1, 1L),
      (2L, 0.5, 5L))
    val out = rows.toDF("q_id", "cos", "n_id")
      .repartition(4) // force partial buffers + merge
      .groupBy(col("q_id"))
      .agg(call_function("graft_topk", col("cos"), col("n_id"), lit(3)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("pos"), col("t.score"), col("t.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 0, 0.95, 2L), (1L, 1, 0.9, 3L), (1L, 2, 0.9, 10L), // tie 0.9 → smaller id first
      (2L, 0, 0.5, 5L)))
  }

  test("native path equals the window formulation on the fixture corpus") {
    val viaAgg = graft.queries.Catalog.all("q51_ann_ivf").build(spark, sf())
    // the candidate top-k must be the bounded aggregate; the one
    // remaining ranking window is probe selection (queries × 8
    // centroids — tiny by construction)
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("graft_topk"), "native top-k must be in the q51 plan")
    // the probe-selection window (orders by qcos) may remain; a ranking
    // window over the CANDIDATES (orders by cos) must not
    assert(!"(?<![a-z])cos#\\d+ DESC".r.unanchored.matches(plan),
      s"candidate ranking must be the bounded aggregate, not a window:\n$plan")
  }
}
