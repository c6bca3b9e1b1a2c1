package graft

import org.apache.spark.sql.functions._

/** Recall floors for the approximate ANN variants (q51 IVF, q52 LSH)
  * against q50's brute-force exact top-k — the same pinned-quality
  * pattern as EmbedNeardupSpec: approximate-by-design components carry a
  * measured, frozen recall metric so a user tuning Probes/SigBits has a
  * baseline instead of flying blind. Floors are frozen at 0.8 from the
  * measured values at sf0.001 (IVF 0.88 with trained centroids, SRP
  * 0.96 — see info() output), not aspirational.
  */
class AnnRecallSpec extends SparkSuite {

  private def topkSet(name: String): Set[(Long, Long)] =
    graft.queries.Catalog.all(name)
      .build(spark, sf())
      .select(col("q_id"), col("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val truth = topkSet("q50_ann_brute")

  test("q51_ann_ivf recall vs brute-force ground truth") {
    assert(truth.size == queries.Similarity.NumQueries * queries.Similarity.TopK,
      s"brute-force truth must be full top-k, got ${truth.size}")
    val ivf = topkSet("q51_ann_ivf")
    val recall = (ivf & truth).size.toDouble / truth.size
    info(f"IVF recall at sf0.001: ${(ivf & truth).size}/${truth.size} = $recall%.2f " +
      s"(${queries.Similarity.Probes}/${queries.Similarity.NumCentroids} centroids probed)")
    assert(recall >= 0.8, f"IVF recall below frozen floor 0.8: $recall%.2f")
  }

  test("native SRP signature and Hamming kernels are bit-identical to the HOF formulation") {
    val e = Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), graft.functions.VectorFns.toDouble(col("embedding")).as("v"))
    val native = e.select(col("vec_id"),
      call_function("graft_srpsig", col("v"), lit(queries.Similarity.SigBits)).as("sg"))
    val hof = e.select(col("vec_id"), queries.Similarity.srpSigHof("v").as("sg"))
    assert(native.except(hof).isEmpty && hof.except(native).isEmpty,
      "graft_srpsig diverges from the interpreted-HOF signature")
    val pairs = native.limit(20).toDF("id_a", "a")
      .crossJoin(native.limit(20).toDF("id_b", "b"))
    val diff = pairs.select(
        call_function("graft_hamming", col("a"), col("b")).as("nh"),
        queries.Similarity.hammingHof("a", "b").as("hh"))
      .filter(col("nh") =!= col("hh"))
    assert(diff.isEmpty, "graft_hamming diverges from the zip_with fold")
  }

  test("q132 IVF dense hybrid leg recall vs the brute dense leg") {
    // the dense leg of q132_hybrid_rrf_ivf, run standalone against the
    // q50 brute-force truth (same 5 queries, same k): fusion quality is
    // bounded by the weaker leg, so the hybrid leg carries a HIGHER
    // floor (0.95) than standalone IVF's 0.8 — that is the whole reason
    // HybridProbes=4 exists instead of reusing Probes=2.
    val e = Tables(spark, sf(), "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFns.toDouble(col("embedding")).as("v"))
    val cents = queries.Similarity.trainCentroids(spark, sf())
    val ivf = queries.Similarity.ivfSearchTopK(spark,
        queries.Similarity.assignToCentroids(spark, e, cents),
        e.filter(col("vec_id") < queries.TextAnalysis.Bm25Queries)
          .select(col("vec_id").as("q_id"), col("v").as("qv")),
        cents, queries.Similarity.HybridProbes, queries.TextAnalysis.Bm25TopK)
      .select(col("q_id"), col("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & truth).size.toDouble / truth.size
    info(f"hybrid dense-leg recall at sf0.001: ${(ivf & truth).size}/${truth.size} " +
      f"= $recall%.2f (${queries.Similarity.HybridProbes}/" +
      s"${queries.Similarity.NumCentroids} centroids probed)")
    assert(recall >= 0.95, f"hybrid dense-leg recall below floor 0.95: $recall%.2f")
  }

  test("q134 kNN graph recall vs the brute all-pairs edge set") {
    import graft.functions.VectorFns
    val e = Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
    // brute n² ground truth: every vector as query (cheap at sf0.001)
    val bruteTruth = queries.Similarity.searchTopK(spark, e,
        e.select(col("vec_id").as("q_id"), col("v").as("qv")),
        queries.Similarity.KnnK)
      .select(col("q_id"), col("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val graph = topkSet("q134_knn_graph")
    val recall = (graph & bruteTruth).size.toDouble / bruteTruth.size
    info(f"kNN-graph recall at sf0.001: ${(graph & bruteTruth).size}/${bruteTruth.size} " +
      f"= $recall%.2f (${queries.Similarity.KnnProbes}/" +
      s"${queries.Similarity.NumCentroids} centroids probed, whole corpus as queries)")
    // measured 0.75 at 4/8 probes — whole-graph recall on this
    // deliberately near-orthogonal fixture is the adversarial case for
    // any partition-based ANN (KnnProbes scaladoc); floor frozen just
    // below the measurement, not aspirational
    assert(recall >= 0.7, f"kNN-graph recall below frozen floor 0.7: $recall%.2f")
  }

  test("q52_ann_lsh recall vs brute-force ground truth") {
    val lsh = topkSet("q52_ann_lsh")
    val recall = (lsh & truth).size.toDouble / truth.size
    info(f"SRP-sketch recall at sf0.001: ${(lsh & truth).size}/${truth.size} = $recall%.2f " +
      s"(${queries.Similarity.SigBits}-bit sketch, C=${queries.Similarity.HammingCandidates})")
    assert(recall >= 0.8, f"LSH recall below frozen floor 0.8: $recall%.2f")
  }

  test("q51 leaves nothing behind in the cache across repeated catalog builds") {
    // r5 persisted the trained centroids per build and never unpersisted:
    // a long-lived session accumulated one cache entry per invocation.
    // The centroids are now collected (k×dim doubles) and rebuilt as a
    // LocalRelation, so repeated builds must not grow the persisted-RDD
    // set. Measured as growth, not emptiness: other suites share the JVM
    // session and may legitimately cache.
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      graft.queries.Catalog.all("q51_ann_ivf").build(spark, sf()).count()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after == before,
      s"q51 builds grew the persisted-RDD set: $before -> $after")
  }

  test("q112 embed outliers match a driver-side fixed-point computation") {
    import queries.Similarity.{FixedPointScale, OutlierK}
    val vecs = spark.read.parquet(s"${sf()}/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.groupBy(_._3).flatMap { case (lbl, vs) =>
      val cent = Array.tabulate(vs.head._2.length) { j =>
        vs.map(v => math.floor(v._2(j) * FixedPointScale.toDouble).toLong).sum
          .toDouble / FixedPointScale.toDouble / vs.length.toDouble
      }
      vs.map(v => (v._1, cos(v._2, cent))).sortBy(t => (t._2, t._1))
        .take(OutlierK).zipWithIndex
        .map { case ((id, c), i) => (lbl, id) -> ((i + 1, c)) }.toSeq
    }.toMap
    val out = graft.queries.Catalog.all("q112_embed_outlier")
      .build(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getInt(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == expected.keySet,
      s"id drift: ${(out.keySet diff expected.keySet) ++ (expected.keySet diff out.keySet)}")
    expected.foreach { case (k, (rk, c)) =>
      assert(out(k)._1 == rk, s"$k rank ${out(k)._1} != $rk")
      // output is round(cos, 4); compare against the raw driver-side value
      assert(math.abs(out(k)._2 - c) <= 5.001e-5, s"$k cos ${out(k)._2} vs $c")
    }
    val labels = vecs.map(_._3).distinct.length
    assert(out.size == labels * OutlierK)
  }

  test("q112 pins a corrupt all-zero embedding at rank 1 with cos -1.0") {
    // cosine(zero, centroid) = 0/0 = NaN; unguarded, NaN breaks the
    // bounded-heap admit test and the two engines' NaN orderings differ —
    // the pin (-1.0, cosine's true minimum) surfaces the corrupt vector
    // first instead, which is the point of the sweep
    import spark.implicits._
    val dir = tmpDir("zero_vec").toString
    val rows = (0L until 8L).map { i =>
      val v = if (i == 7L) Seq.fill(4)(0f)
              else Seq.tabulate(4)(j => (i + j + 1).toFloat)
      (i, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.Catalog.all("q112_embed_outlier").build(spark, dir)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._2)
    assert(out.head == ((7L, 1, -1.0)), s"got ${out.toSeq}")
    assert(out.forall(x => !x._3.isNaN))
  }

  test("q124 semdedup flags verify exactly against the pairwise definition") {
    // Given the output's clustering (cross-checked by the DuckDB oracle),
    // the dup flag must equal the pairwise rule verbatim: b is dup iff a
    // same-cluster member with (cosc, id) strictly lower is ≥ tau close.
    val tau = queries.Similarity.SemDedupTau
    val out = graft.queries.Catalog.all("q124_semdedup").build(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val vecs = Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), graft.functions.VectorFns.toDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = out.groupBy(_._2)
    for ((_, members) <- byCluster; (bId, _, bCosc, bDup) <- members) {
      val expected = members.exists { case (aId, _, aCosc, _) =>
        (aCosc < bCosc || (aCosc == bCosc && aId < bId)) &&
          cos(vecs(aId), vecs(bId)) >= tau
      }
      assert(bDup == expected, s"vec $bId: flag $bDup, pairwise rule $expected")
    }
    // the per-cluster minimum-priority member has no witness — always kept
    for ((c, members) <- byCluster) {
      val m = members.minBy(x => (x._3, x._1))
      assert(!m._4, s"cluster $c minimum-priority member ${m._1} marked dup")
    }
    assert(out.count(_._4) > 0, "fixture produced no semantic duplicate")
  }

  test("q129 cluster profile: conservation, share bounds, mode correctness") {
    val out = graft.queries.Catalog.all("q129_cluster_profile").build(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val corpusN = Tables(spark, sf(), "embeddings").count()
    assert(out.map(_._2).sum == corpusN, "cluster sizes must partition the corpus")
    out.foreach { case (c, n, src, share, cosc, chars) =>
      assert(n > 0 && share > 0.0 && share <= 1.0, s"cluster $c share $share")
      assert(cosc >= -1.0 && cosc <= 1.0, s"cluster $c mean cosc $cosc")
      assert(chars > 0.0, s"cluster $c mean chars $chars")
      assert(src.nonEmpty)
    }
    // the dominant source really dominates: recompute one cluster's mode
    // from the q124 assignment (same trained index) + the documents table
    val asg = graft.queries.Catalog.all("q124_semdedup").build(spark, sf())
      .select(col("vec_id"), col("c_id"))
    val docs = Tables(spark, sf(), "documents").select(col("doc_id"), col("source"))
    val counts = asg.join(docs, asg("vec_id") === docs("doc_id"))
      .groupBy(col("c_id"), col("source")).count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expectedMode = counts.groupBy(_._1).map { case (c, rows) =>
      c -> rows.minBy(x => (-x._3, x._2))._2
    }
    out.foreach { case (c, _, src, _, _, _) =>
      assert(expectedMode(c) == src, s"cluster $c mode: $src vs ${expectedMode(c)}")
    }
  }

  test("q242: IVF ranking fidelity — floors frozen, disturbance actually observed") {
    import org.apache.spark.sql.functions.col
    val got = graft.queries.Catalog.all("q242_ann_rank_fidelity")
      .build(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.size == graft.queries.Similarity.NumQueries)
    // frozen floor (deterministic pipeline; observed min 1498): a drop
    // below means probing or the heap tie-order regressed
    got.foreach { case (q, rbo) =>
      assert(rbo >= 1400L, s"query $q fidelity collapsed: $rbo")
    }
    // the fixture must show BOTH regimes or the audit is vacuous: at
    // least one rank-exact query and one genuinely disturbed ranking
    assert(got.values.exists(_ == 1860L), s"no rank-exact query: $got")
    assert(got.values.exists(_ < 1860L), s"no disturbed ranking: $got")
  }
}
