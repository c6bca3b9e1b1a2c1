package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The duplicate-subtree lint kernel (round-15 verdict item 2), shared
  * by the enforcing PlanSpec tests and the LintScratch diagnostic main
  * so the two can never drift.
  *
  * The q228/q233 class: a corpus-sized join/aggregate subtree
  * referenced from two places in a query builds TWICE in the physical
  * plan (no ReusedExchange) — at 100 TB that doubles the dominant
  * fact-scan + exchange cost.
  */
object PlanLint {

  /** Fact-sized tables: the ones whose double-scan is a 100 TB outage.
    * region/nation/supplier/customer/part are dims here
    * (broadcast-class).
    */
  val FactTables: Seq[String] = Seq("lineitem", "orders", "events",
    "documents", "embeddings")

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

  def isHeavy(p: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p.exists {
      case _: Aggregate | _: Join | _: Window | _: Distinct => true
      case _ => false
    }
  }

  /** Identity under which two subtrees are "the same computation".
    * Column pruning rewrites an Aggregate's OUTPUT list per consumer
    * (one arm keeps (pk, sk, cost), the other just (pk, cost)), so
    * EVERY aggregate is keyed by (grouping, child) instead of full
    * canonical equality: two aggregates with the same grouping over the
    * same input are one pass — whether they kept different output
    * subsets (the q228 distinct class) or carry different aggregate
    * functions entirely (the q244 class: the histogram and its totals
    * frame should re-aggregate one materialization, or fuse into one
    * agg). Everything else must match exactly.
    */
  def dupKey(n: LogicalPlan): Any = {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    n.canonicalized match {
      case a: Aggregate => ("agg", a.groupingExpressions, a.child)
      case other => other
    }
  }

  /** Maximal subtrees that occur ≥2 times (by [[dupKey]]) in the plan
    * and are heavy + fact-bearing. Top-down: a duplicated parent
    * subsumes its (necessarily duplicated) children.
    */
  def duplicatedFactSubtrees(lp: LogicalPlan): Seq[LogicalPlan] = {
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
}
