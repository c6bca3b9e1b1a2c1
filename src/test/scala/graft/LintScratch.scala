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

    import org.apache.spark.sql.catalyst.plans.logical._
    val FactTables = Seq("lineitem", "orders", "events", "documents", "embeddings")
    def scansFact(p: LogicalPlan): Boolean =
      p.collectLeaves().exists {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              val loc = fs.location.rootPaths.mkString(",")
              FactTables.exists(t => loc.contains(t + ".parquet"))
            case _ => false
          }
        case _ => false
      }
    def isHeavy(p: LogicalPlan): Boolean = p.exists {
      case _: Aggregate | _: Join | _: Window | _: Distinct => true
      case _ => false
    }
    def dupKey(n: LogicalPlan): Any = {
      import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
      n.canonicalized match {
        case a: Aggregate
            if !a.aggregateExpressions.exists(_.exists(_.isInstanceOf[AggregateExpression])) =>
          ("distinct", a.groupingExpressions, a.child)
        case other => other
      }
    }
    def dups(lp: LogicalPlan): Seq[LogicalPlan] = {
      val counts = scala.collection.mutable.Map.empty[Any, Int]
      lp.foreach { n =>
        if (isHeavy(n) && scansFact(n)) {
          val c = dupKey(n)
          counts(c) = counts.getOrElse(c, 0) + 1
        }
      }
      val dupForms = counts.collect { case (k, v) if v >= 2 => k }.toSet
      val out = scala.collection.mutable.Buffer.empty[LogicalPlan]
      def walk(n: LogicalPlan): Unit =
        if (dupForms(dupKey(n))) out += n
        else n.children.foreach(walk)
      walk(lp)
      out.toSeq
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
