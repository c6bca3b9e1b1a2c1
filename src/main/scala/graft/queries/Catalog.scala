package graft.queries

import scala.collection.immutable.ListMap

/** Assembles every query family into the single catalog SparkEntry
  * exposes. Names are unique across families (enforced at load).
  */
object Catalog {
  lazy val all: ListMap[String, Q] = {
    val families: Seq[ListMap[String, Q]] = Seq(
      Relational.defs, Windowed.defs, AuditOps.defs,
      Dedup.defs, Similarity.defs, TextAnalysis.defs, Multimodal.defs,
      Pipeline.defs, Evaluation.defs)
    val merged = families.foldLeft(ListMap.empty[String, Q])(_ ++ _)
    val n = families.map(_.size).sum
    require(merged.size == n, s"duplicate query names: ${n - merged.size}")
    merged
  }

  lazy val headline: ListMap[String, Q] = all.filter(_._2.headline)
}
