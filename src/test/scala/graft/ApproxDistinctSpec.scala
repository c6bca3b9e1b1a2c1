package graft

import org.apache.spark.sql.functions._

/** q16_approx_distinct stays rows-only in CORRECTNESS (HLL has no exact
  * DuckDB oracle), so the error bound is asserted HERE: the HLL++ rsd
  * parameter is a standard-deviation guarantee, and 3σ is the
  * conventional "practically always" band.
  */
class ApproxDistinctSpec extends SparkSuite {

  test("q16: |approx − exact| / exact ≤ 3×rsd per group") {
    val rsd = 0.02 // must match the literal in Relational.scala q16
    val approx = graft.queries.Catalog.all("q16_approx_distinct").build(spark, sf())
    val exact = Tables(spark, sf(), "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val joined = approx.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("approx_parts"), col("exact_parts"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val relErr = math.abs(a - e) / e
      info(f"${r.getString(0)}: approx=$a%.0f exact=$e%.0f relErr=$relErr%.4f")
      assert(relErr <= 3 * rsd,
        f"group ${r.getString(0)}: HLL error $relErr%.4f exceeds 3×rsd=${3 * rsd}%.2f")
    }
  }
}
