package graft

import org.apache.spark.sql.functions._

/** q16_approx_distinct's numeric guarantee. The catalog query is
  * hash-gateable (it emits per-group exact_n plus an approx_within_3rsd
  * boolean the oracle pins to TRUE), but the boolean alone would hide
  * HOW close the sketch runs — so the raw |approx − exact| / exact is
  * asserted here against the 3σ band the HLL++ rsd parameter promises,
  * and the catalog's boolean is cross-checked against the same raw
  * values.
  */
class ApproxDistinctSpec extends SparkSuite {

  test("q16: |approx − exact| / exact ≤ 3×rsd per group, and the catalog boolean agrees") {
    val rsd = 0.02 // must match the literal in Relational.scala q16
    val raw = Tables(spark, sf(), "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val relErr = math.abs(a - e) / e
      info(f"${r.getString(0)}: approx=$a%.0f exact=$e%.0f relErr=$relErr%.4f")
      assert(relErr <= 3 * rsd,
        f"group ${r.getString(0)}: HLL error $relErr%.4f exceeds 3×rsd=${3 * rsd}%.2f")
    }
    // the catalog's gateable boolean must be TRUE everywhere the raw
    // bound holds (same inputs ⇒ any false here is a wiring bug, not
    // sketch noise)
    val catalog = graft.queries.Catalog.all("q16_approx_distinct").build(spark, sf())
      .collect()
    assert(catalog.length == raw.length)
    catalog.foreach { r =>
      assert(r.getBoolean(2), s"catalog q16 boolean false for ${r.getString(0)}")
    }
  }
}
