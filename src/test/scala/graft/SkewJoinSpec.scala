package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-skew mitigation, demonstrated on a PLANTED hot key (one key =
  * 50% of the fact rows — the distribution that melts one reducer at
  * 100 TB): (1) AQE's runtime skew-join split fires and splits the hot
  * partition; (2) the salted rewrite spreads the hot key's reducer load
  * ~shards× while returning exactly the plain join's rows. ScaleProbe
  * `--skew` measures wall-time and task distribution at probe scale.
  */
class SkewJoinSpec extends SparkSuite {

  private val nRows = 100000
  private val nKeys = 1000

  /** 50% of rows on key 0, the rest uniform over 1..nKeys-1. */
  private def skewedFact: DataFrame =
    spark.range(nRows).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys - 1)) + 1).as("k"),
      col("id").as("uid"),
      (col("id") % 97).cast("double").as("v"))

  private def dim: DataFrame =
    spark.range(nKeys).select(col("id").as("k"),
      concat(lit("g"), col("id") % 7).as("grp"))

  test("AQE splits the planted skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = skewedFact.join(dim, Seq("k"))
        .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val rows = joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$p")
      // and the split join still returns the exact plain-join result
      val plain = skewedFact.join(dim, Seq("k"))
        .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .collect()
      assert(rows.map(_.toSeq).toSet == plain.map(_.toSeq).toSet)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("saltedJoin returns exactly the plain join and spreads the hot key over shards") {
    val shards = 8
    val salted = operators.SkewJoin.saltedJoin(skewedFact, dim, "k", "uid", shards)
    val plain = skewedFact.join(dim, Seq("k"))

    // exact parity, row-level (same multiset of rows)
    val a = salted.select(col("k"), col("uid"), col("v"), col("grp"))
      .collect().map(_.toSeq).sorted(Ordering.by((s: Seq[Any]) => s.toString))
    val b = plain.select(col("k"), col("uid"), col("v"), col("grp"))
      .collect().map(_.toSeq).sorted(Ordering.by((s: Seq[Any]) => s.toString))
    assert(a.sameElements(b))

    // reducer-load distribution under the join's hash partitioning:
    // unsalted, the hot key's reducer carries ~50% of all rows; salted,
    // no reducer carries more than ~50%/shards (+ the uniform residue)
    def maxShare(parted: DataFrame): Double = {
      val sizes = parted.groupBy(spark_partition_id().as("p"))
        .agg(count(lit(1)).as("n")).collect().map(_.getAs[Long]("n"))
      sizes.max.toDouble / sizes.sum
    }
    val before = maxShare(skewedFact.repartition(32, col("k")))
    val after = maxShare(
      skewedFact.withColumn("__salt",
          pmod(xxhash64(col("uid")), lit(shards)).cast("int"))
        .repartition(32, col("k"), col("__salt")))
    assert(before > 0.45, s"plant failed: hottest reducer share $before")
    // each salt shard carries ~50%/8 ≈ 6%; two shards hash-colliding
    // into one of the 32 reducers plus the uniform residue lands the
    // expected max around 14% — assert the order-of-magnitude drop,
    // not the collision-free ideal
    assert(after < before / 3 && after < 0.2,
      s"salting did not spread the hot key: $before -> $after")
  }
}
