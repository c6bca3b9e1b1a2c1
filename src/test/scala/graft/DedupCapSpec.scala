package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** q43's document-frequency cap: with the cap engaged every posting
  * list feeding pair generation is bounded, only capped shingles drop
  * out, and the production cap (DfCap) is a no-op at fixture scale.
  */
class DedupCapSpec extends SparkSuite {

  private def pairs(dfCap: Int): Set[(Long, Long)] =
    Dedup.ngramJaccard(spark, sf(), dfCap)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cap engaged: buckets bounded, survivors a subset, production cap a no-op") {
    // the fixture has shingles with df > 3 (max df 9) — cap=3 engages
    val dfs = Tables(spark, sf(), "documents")
      .select(col("doc_id"), explode(graft.functions.ParityFns.shingles3(col("text"))).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
    assert(dfs.filter(col("df") > 3).count() > 0, "fixture must engage a cap of 3")

    val uncapped = pairs(Int.MaxValue)
    val capped3 = pairs(3)
    // dropping index entries can only shrink intersections ⇒ survivors
    // are a subset of the uncapped result
    assert(capped3.subsetOf(uncapped), s"cap added pairs: ${(capped3 -- uncapped).take(5)}")
    assert(capped3.size < uncapped.size,
      "a df-3 cap on this corpus must actually drop some pairs")
    info(s"cap=3 keeps ${capped3.size}/${uncapped.size} pairs")

    // the production DfCap sits far above every fixture df ⇒ identical
    assert(pairs(Dedup.DfCap) == uncapped)
  }
}
