package graft

import org.apache.spark.sql.functions._

/** q143_containment vs a brute-force driver-side reference (distinct
  * 3-shingle sets per doc, exact pairwise c/min(|A|,|B|)) — the same
  * small-scale-only cross-check pattern as EmbedNeardupSpec; the catalog
  * query must never be the O(n²) formulation. Also pins the regime
  * DIFFERENCE from q43: containment ≥ Jaccard on every pair.
  */
class ContainmentSpec extends SparkSuite {

  private def shingles(text: String): Set[String] = {
    val w = text.split(" ", -1)
    (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("q143 pairs match the brute-force containment ground truth") {
    val docs = Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1)))
    val tau = graft.queries.Dedup.ContainTau
    val expected = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      (ida, sa) = docs(i)
      (idb, sb) = docs(j)
      if sa.nonEmpty && sb.nonEmpty
      c = (sa & sb).size
      cont = c.toDouble / math.min(sa.size, sb.size)
      if cont >= tau
    } yield (math.min(ida, idb), math.max(ida, idb),
      math.rint(cont * 1e4) / 1e4)).toSet
    val got = graft.queries.Catalog.all("q143_containment").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // rounding halfway cases: compare keys exactly, scores to 4dp ± 1ulp
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)),
      s"pair sets differ; spark-only=${(got.map(t => (t._1, t._2)) --
        expected.map(t => (t._1, t._2))).take(3)}")
    val expScore = expected.map(t => (t._1, t._2) -> t._3).toMap
    got.foreach { case (a, b, s) =>
      assert(math.abs(s - expScore((a, b))) <= 1e-4, s"($a,$b): $s vs ${expScore((a, b))}")
    }
    assert(got.nonEmpty, "fixture must contain >= 1 containment pair")
  }

  test("planted snippet: containment finds the near-superset pair Jaccard misses") {
    // the fixture corpus has NO partial-containment pairs (planted
    // near-dups are same-length, so containment ≡ jaccard there — see
    // the q143 doc comment); the regime difference is planted here: a
    // 10-word snippet quoted verbatim from a 60-word doc has containment
    // 8/8 = 1.0 but jaccard 8/58 ≈ 0.14, invisible to q43's 0.5 floor.
    import spark.implicits._
    val dir = tmpDir("contain").toString
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val snip = (11 to 20).map(i => s"w$i").mkString(" ")
    val noise = (101 to 160).map(i => s"x$i").mkString(" ")
    Seq((0L, long, "en", "src0", long.length.toLong),
        (1L, snip, "en", "src0", snip.length.toLong),
        (2L, noise, "en", "src0", noise.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val cont = graft.queries.Dedup.ngramContainment(spark, dir, graft.queries.Dedup.DfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cont == Set((0L, 1L, 1.0)), s"got $cont")
    val jac = graft.queries.Dedup.ngramJaccard(spark, dir, graft.queries.Dedup.DfCap)
      .collect()
    assert(jac.isEmpty, "Jaccard at its 0.5 floor must miss the snippet pair")
  }

  test("containment dominates Jaccard on the shared candidate pairs") {
    val jac = graft.queries.Catalog.all("q43_ngram_jaccard").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cont = graft.queries.Catalog.all("q143_containment").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every Jaccard >= tau pair must appear with containment >= Jaccard
    // (c/min <= is impossible below c/union): q43 ∩ q143 keys where both
    // thresholds pass
    jac.foreach { case (k, j) =>
      cont.get(k).foreach(c =>
        assert(c >= j - 1e-9, s"containment $c < jaccard $j for $k"))
    }
  }
}
