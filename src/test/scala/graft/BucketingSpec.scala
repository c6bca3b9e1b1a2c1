package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketing: both fact tables written bucketed on
  * the join key join WITHOUT a shuffle — the plan must contain no
  * Exchange above either scan. At 100 TB this turns the recurring
  * fact-fact join from two full-data shuffles into zero.
  */
class BucketingSpec extends SparkSuite {

  test("join of co-bucketed tables has no exchange") {
    val li = Tables(spark, sf(), "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val o = Tables(spark, sf(), "orders")
      .select("o_orderkey", "o_orderpriority")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    try {
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
      o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")

      // hint("merge"): at fixture scale AQE would broadcast instead,
      // hiding the property under test (bucketed SMJ without exchange)
      val joined = spark.table("li_b").hint("merge")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString

      assert(p.contains("SortMergeJoin"))
      assert(p.contains("Bucketed: true"))
      // the join reads bucketed scans directly — no shuffle on the join
      // keys anywhere in the plan (the aggregation above still exchanges
      // on its own grouping key, which is expected)
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)

      // and it returns the same result as the unbucketed plan
      val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"))
      assert(joined.collect().map(_.toSeq).toSet == expect.collect().map(_.toSeq).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
