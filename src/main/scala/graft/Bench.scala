package graft

import graft.queries.Catalog
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query set against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop sink
  * (a bare count() would let Catalyst prune the projections being timed).
  * Prints exactly one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // ObjectHashAggregateExec (every collectCapped/TypedImperative
      // posting-list build: q41/q43/q44/q45) falls back to SORT-based
      // aggregation after only 128 distinct keys per task (Spark
      // default) — i.e. the whole exploded shingle stream gets sorted
      // twice. 128k keys/task × small capped buffers is ~tens of MB:
      // keep the hash regime at our scale, keep the fallback as the
      // OOM backstop beyond it.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      // build() INSIDE the timed window: fit-carrying queries (q51/
      // q124/q129/q130/q132's trainCentroids/bpeFit) execute their
      // driver-side model collects eagerly at build time, and excluding
      // them reported q130's entire 32-round fit as a 14 ms LocalRelation
      // write. Methodology rebased in round 9 — NOTES.md records it.
      val t0 = System.nanoTime()
      try {
        val df = Catalog.all(name).build(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        // stop the clock BEFORE the finally: cache teardown is between-
        // runs hygiene, not part of the query being measured
        (System.nanoTime() - t0) / 1e9
      }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      } finally {
        // Queries that persist an intermediate (q125's tokenized-docs
        // projection) must not hand the NEXT timed run a warm cache —
        // every sample pays the full cold pipeline.
        spark.sharedState.cacheManager.clearCache()
      }
    }

    // Iteration aid: SPARK_GRAFT_BENCH_ONLY=q125_bm25,q128_hybrid_rrf
    // restricts the set (the driver never sets it — full run per round).
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(list) =>
        val want = list.split(",").map(_.trim).filter(_.nonEmpty).toSet
        Catalog.headline.filter { case (k, _) => want(k) }
      case None => Catalog.headline
    }

    // Warm-up: a short untimed pass over three representative shapes
    // (columnar scan + SMJ, the exploded-shingle ObjectHashAggregate
    // path, the vector-HOF kernels) warms the JVM-wide JIT and parquet
    // footer caches. Per-query codegen compile is NOT pre-warmed — it
    // lands in each query's FIRST timed sample only, and the median of
    // 3 discards that sample. (A full-set warm-up pass cost ~1/4 of
    // bench wall-clock for the same medians — round-10 trim.)
    val warm = Seq("q04_join_sortmerge", "q41_dedup_minhash", "q50_ann_brute")
    warm.filter(Catalog.headline.contains).foreach(run)

    // Median of 3 timed runs per query: this VM shows 2–4× per-query
    // variance under CPU steal (NOTES.md), and a single sample has
    // produced phantom multi-× regressions. A failed run (-1) medians
    // to -1 only if ≥2 of 3 fail.
    def median3(name: String): Double = {
      val xs = Seq.fill(3)(run(name)).sorted
      xs(1)
    }
    val results = selected.keys.map(n => n -> median3(n)).toSeq

    // Fit/probe split (round-9 verdict #1): entries carrying a model or
    // index artifact (band index, BM25 postings, IVF centroids +
    // assignment, BPE dictionary, DSIR delta map) report a SECOND
    // number — the serving plan against a prebuilt warm artifact, the
    // cost a standing deployment pays per batch. The cold number above
    // keeps timing fit + probe end to end. prepare (the fit) runs
    // OUTSIDE the clock; probe samples share the warm artifact, so no
    // cache clearing between them — only after the carrier finishes.
    def runThunk(thunk: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        thunk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] probe failed: ${e.getMessage}")
        -1.0
      }
    }
    val probeResults = selected.toSeq.flatMap { case (name, q) =>
      q.probe.map { p =>
        try {
          val thunk = p(spark, sfDir) // fit: untimed
          // no warm-up: the first sample carries the probe shape's
          // codegen compile and the median of 3 discards it
          val xs = Seq.fill(3)(runThunk(thunk)).sorted
          name -> xs(1)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name probe prepare failed: ${e.getMessage}")
          name -> -1.0
        } finally {
          spark.sharedState.cacheManager.clearCache()
        }
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ps = probeResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"probes":$ps,"sf":"$sfDir"}"""
    // Also write the object to a file (unambiguous regardless of how
    // the scraper reads stdout) ...
    val outPath = java.nio.file.Paths.get("out", "bench.json")
    java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.write(outPath, json.getBytes("UTF-8"))
    System.err.println(s"[bench] json written to ${outPath.toAbsolutePath}")
    // ... and print the JSON as the LAST stdout line this process emits.
    // run/outputStrategy = StdoutOutput passes it through un-prefixed
    // (sbt's default LoggedOutput wraps forked stdout in "[info]", which
    // is why BENCH_r*.json recorded "parsed": null through round 7).
    println(json)
    spark.stop()
  }
}
