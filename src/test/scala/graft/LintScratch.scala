package graft

import graft.queries.Catalog
import org.apache.spark.sql.SparkSession

/** throwaway diagnostic for the duplicate-subtree lint — not a test */
object LintScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .appName("lint-scratch")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    // lint kernel is single-sourced in PlanLint (PlanSpec enforces it)
    def dups(lp: LogicalPlan): Seq[LogicalPlan] =
      PlanLint.duplicatedFactSubtrees(lp)

    // mode 2: count fact-table SCANS per entry (any subplan shape),
    // descending into caches — the same-table >=2 report is the
    // double-I/O sweep the canonical-dup lint cannot see. Kernel is
    // single-sourced in PlanLint.factScanCounts (PlanDump records the
    // counts into PLANS.md; PlanSpec asserts them).
    if (args.length > 1 && args(1) == "--scans") {
      Catalog.all.keys.toSeq.sorted.foreach { name =>
        try {
          val df = Catalog.all(name).build(spark, sfDir)
          val multi = PlanLint.factScanCounts(df.queryExecution.optimizedPlan)
            .collect { case (t, n) if n >= 2 => s"${t}x$n" }
          if (multi.nonEmpty) println(s"== $name ${multi.mkString(" ")}")
        } catch { case e: Throwable =>
          println(s"== $name ERROR ${e.getMessage}")
        } finally spark.sharedState.cacheManager.clearCache()
      }
      spark.stop(); return
    }

    val names = if (args.length > 1) args(1).split(",").toSeq else Catalog.all.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = Catalog.all(name).build(spark, sfDir)
        val d = dups(df.queryExecution.optimizedPlan)
        if (d.nonEmpty) {
          df.write.format("noop").mode("overwrite").save()
          val p = df.queryExecution.executedPlan.toString
          val reused = p.contains("ReusedExchange") || p.contains("InMemoryTableScan")
          println(s"== $name dup=${d.size} reusedMarker=$reused")
          d.zipWithIndex.foreach { case (t, i) =>
            println(s"---- dup[$i]:")
            println(t.toString.linesIterator.take(7).map("    " + _).mkString("\n"))
          }
          if (args.length > 1) {
            println("---- executed plan:")
            println(p.linesIterator.take(60).mkString("\n"))
          }
        }
      } catch { case e: Throwable =>
        println(s"== $name ERROR ${e.getMessage}")
      } finally spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
