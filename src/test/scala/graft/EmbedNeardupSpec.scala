package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._

/** q44_embed_neardup (LSH-bucketed) vs the brute-force all-pairs ground
  * truth, which lives HERE as a small-scale cross-check only — the
  * catalog query must never be the O(n²) formulation.
  */
class EmbedNeardupSpec extends SparkSuite {

  private def brutePairs = {
    val e = Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", VectorFns.cosine(spark, col("va"), col("vb")))
      .filter(col("cos") >= 0.45)
      .select(col("id_a"), col("id_b"))
  }

  test("bucketed pairs are a subset of brute-force ground truth, recall measured") {
    val bucketed = graft.queries.Catalog.all("q44_embed_neardup")
      .build(spark, sf())
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = brutePairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(brute),
      s"LSH found non-pairs: ${(bucketed -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must contain ≥1 near-dup pair")
    val recall = bucketed.size.toDouble / brute.size
    info(f"LSH recall at sf0.001: ${bucketed.size}/${brute.size} = $recall%.2f " +
      s"(${graft.queries.Dedup.EmbBands} bands × ${graft.queries.Dedup.EmbBandBits} bits)")
    // frozen after the r8 retune (8→12 bands: measured 7/7 = 1.00);
    // deterministic planes make the measurement exact, the 0.85 floor
    // leaves headroom for fixture regeneration only
    assert(recall >= 0.85, f"recall below documented floor (Dedup.scala q44 doc): $recall%.2f")
  }

  test("q44 plan has no all-pairs join — only the tiny plane broadcast") {
    val plan = graft.queries.Catalog.all("q44_embed_neardup")
      .build(spark, sf()).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // exactly one nested-loop join: corpus × broadcast(32 planes), linear
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj == 1, s"expected exactly the plane-broadcast BNLJ, found $bnlj\n$plan")
  }
}
