package graft

import graft.queries.Catalog

/** Every catalog query must build and run at sf0.001; the driver's
  * correctness gate (DuckDB hash compare) runs at sf0.01 — this spec is
  * the fast structural guard.
  */
class CatalogSpec extends SparkSuite {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // Queries where an empty result at sf0.001 is legitimate (tiny corpus
  // may simply lack near-dup pairs above threshold).
  private val mayBeEmpty = Set(
    "q41_dedup_minhash", "q43_ngram_jaccard", "q44_embed_neardup")

  Catalog.all.foreach { case (name, q) =>
    test(s"$name runs at sf0.001") {
      val n = q.build(spark, sf()).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
