package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (test scope): run the dedup family against an
  * arbitrary documents dir — typically a deliberately duplicate-heavy
  * corpus — to observe the capped-bucket designs under duplicate
  * blow-up. Usage:
  *
  *   sbt "Test/runMain graft.ScaleProbe /path/with/documents.parquet"
  *
  * (Each doc duplicated k times makes every LSH bucket a k-clique; the
  * BucketCap guard is what keeps pair generation bounded.)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale_probe")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n rows")
    }
    time("q41_minhash_capped")(
      queries.Dedup.minhashPairs(spark, dir, queries.Dedup.BucketCap).count())
    time("q43_ngram_hashed")(
      queries.Dedup.ngramJaccard(spark, dir, queries.Dedup.DfCap).count())
    time("q45_simhash_banded")(
      queries.Catalog.all("q45_simhash_hamming").build(spark, dir).count())
    spark.stop()
  }
}
