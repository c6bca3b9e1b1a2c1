package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** The dedup-family scale guards, exercised while ENGAGED (not just at
  * their fixture-scale no-op settings): q43's document-frequency cap and
  * q41/q44's LSH band-bucket cap on synthetic duplicate-heavy corpora
  * where the uncapped pair count is quadratic in cluster size.
  */
class DedupCapSpec extends SparkSuite {

  private def pairs(dfCap: Int): Set[(Long, Long)] =
    Dedup.ngramJaccard(spark, sf(), dfCap)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cap engaged: buckets bounded, survivors a subset, production cap a no-op") {
    // the fixture has shingles with df > 3 (max df 9) — cap=3 engages
    val dfs = Tables(spark, sf(), "documents")
      .select(col("doc_id"), explode(graft.functions.ParityFns.shingles3(col("text"))).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
    assert(dfs.filter(col("df") > 3).count() > 0, "fixture must engage a cap of 3")

    val uncapped = pairs(Int.MaxValue)
    val capped3 = pairs(3)
    // dropping index entries can only shrink intersections ⇒ survivors
    // are a subset of the uncapped result
    assert(capped3.subsetOf(uncapped), s"cap added pairs: ${(capped3 -- uncapped).take(5)}")
    assert(capped3.size < uncapped.size,
      "a df-3 cap on this corpus must actually drop some pairs")
    info(s"cap=3 keeps ${capped3.size}/${uncapped.size} pairs")

    // the production DfCap sits far above every fixture df ⇒ identical
    assert(pairs(Dedup.DfCap) == uncapped)
  }

  /** A near-dup cluster of k DISTINCT texts with IDENTICAL shingle sets:
    * rotations of a k-word cycle (wrapped by 2 words) all produce the
    * same distinct-3-shingle set, so every band buckets all k together
    * and uncapped pair generation is exactly k(k-1)/2 — the blow-up
    * BucketCap exists to bound. Distinct texts matter: identical texts
    * would be collapsed by the exact-dup pre-pass and expanded
    * algebraically, never touching the buckets the cap guards.
    */
  private def dupDocsDir(k: Int): String = {
    val dir = tmpDir("dedupcap-docs").toString
    val session = spark; import session.implicits._
    val cycle = (0 until k).map(i => s"w$i")
    val dup = (1L to k.toLong).map { i =>
      val rot = cycle.drop(i.toInt - 1) ++ cycle.take(i.toInt - 1)
      (i, (rot ++ rot.take(2)).mkString(" "))
    }
    val distinct = (200L to 205L).map(i =>
      (i, s"totally unrelated document number $i with its own words entirely"))
    (dup ++ distinct).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q41 bucket cap engaged: k-duplicate cluster bounded at cap(cap-1)/2") {
    val k = 30; val cap = 5
    val dir = dupDocsDir(k)
    def run(c: Int): Set[(Long, Long)] =
      Dedup.minhashPairs(spark, dir, c).select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run(Int.MaxValue)
    val capped = run(cap)
    // identical texts ⇒ identical signatures ⇒ one mega-bucket per band
    assert(uncapped.size == k * (k - 1) / 2, s"expected full clique, got ${uncapped.size}")
    assert(capped.size == cap * (cap - 1) / 2, s"cap must bound the clique, got ${capped.size}")
    assert(capped.subsetOf(uncapped))
    // truncation, not drop: the first-by-id cap members are still flagged
    assert(capped == (for { a <- 1L to cap.toLong; b <- a + 1 to cap.toLong } yield (a, b)).toSet)
    // the production cap sits above this cluster ⇒ no-op here
    assert(run(Dedup.BucketCap) == uncapped)
  }

  test("engaged caps are observable: bucket telemetry counts truncations") {
    // the caps silently truncate by design; production needs to SEE the
    // truncation (observe() named metrics) instead of inferring it
    val k = 30; val cap = 5
    val dir = dupDocsDir(k)
    val engaged = Dedup.minhashPairs(spark, dir, cap)
    engaged.collect()
    val m = engaged.queryExecution.observedMetrics("minhash_bucket_caps")
    assert(m.getAs[Long]("buckets_capped") > 0L,
      s"cap=$cap on a $k-clique must report engaged buckets: $m")
    assert(m.getAs[Long]("buckets") >= m.getAs[Long]("buckets_capped"))

    // disengaged production cap reports zero — the quiet case stays quiet
    val quiet = Dedup.minhashPairs(spark, dir, Dedup.BucketCap)
    quiet.collect()
    assert(quiet.queryExecution.observedMetrics("minhash_bucket_caps")
      .getAs[Long]("buckets_capped") == 0L)
  }

  test("q43 df-cap telemetry counts dropped posting lists") {
    val df = Dedup.ngramJaccard(spark, sf(), 3)
    df.collect()
    val m = df.queryExecution.observedMetrics("ngram_df_caps")
    assert(m.getAs[Long]("buckets_capped") > 0L,
      s"fixture has shingles with df > 3, telemetry must see them: $m")
  }

  test("q101 closure: chains close transitively, min-id keeper, multi-component") {
    val session = spark; import session.implicits._
    // the closure core on explicit edges — independent of LSH banding:
    // a 6-long path (needs several propagation rounds), a triangle, an
    // isolated pair; vertices 1 and 3 never share an edge yet must land
    // in one cluster
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), // path
      (10L, 11L), (11L, 12L), (10L, 12L),               // triangle
      (20L, 21L))                                        // pair
      .toDF("doc_a", "doc_b")
    val out = Dedup.clusterPairs(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out.keySet == (1L to 6L).toSet ++ Set(10L, 11L, 12L, 20L, 21L))
    assert((1L to 6L).forall(v => out(v) == (1L, 6L, v == 1L)), s"path: $out")
    assert(Seq(10L, 11L, 12L).forall(v => out(v) == (10L, 3L, v == 10L)), s"clique: $out")
    assert(Seq(20L, 21L).forall(v => out(v) == (20L, 2L, v == 20L)), s"pair: $out")
  }

  test("q101 star contraction: long chain closes in O(log n) rounds, propagation-identical labels") {
    val session = spark; import session.implicits._
    // a 30-node path (diameter 29): propagation would need 29 rounds, so
    // the starSwitch=4 default escalates to large-star/small-star, which
    // must close it in ~log2(30) rounds with the SAME min-id labeling
    val chain = (1L to 29L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val rounds = scala.collection.mutable.Buffer.empty[String]
    val out = Dedup.clusterPairsInstrumented(chain, 20, 4, (n, _) => rounds += n)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out.keySet == (1L to 30L).toSet)
    assert((1L to 30L).forall(v => out(v) == (1L, 30L, v == 1L)), s"chain: $out")
    val starRounds = rounds.count(_.startsWith("star"))
    assert(starRounds > 0, s"expected star escalation, rounds were $rounds")
    assert(starRounds <= 7, s"star contraction must be O(log n), took $rounds")
    info(s"rounds: ${rounds.mkString(", ")}")
  }

  test("q101 equivalence: random graphs match a driver-side union-find in both regimes") {
    val session = spark; import session.implicits._
    // seeded => deterministic; pure-star (starSwitch=0) and
    // pure-propagation (starSwitch=64) must both reproduce the
    // union-find ground truth exactly on arbitrary topologies
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n + rnd.nextInt(2 * n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val label = verts.groupBy(v => find(v.toInt))
        .flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }
      val size = label.groupBy(_._2).map { case (l, vs) => l -> vs.size.toLong }
      val truth = verts.map(v =>
        v -> ((label(v), size(label(v)), v == label(v)))).toMap
      val df = edges.toDF("doc_a", "doc_b")
      for (switch <- Seq(0, 64)) {
        val out = Dedup.clusterPairs(df, maxRounds = 64, starSwitch = switch)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
          .toMap
        assert(out == truth,
          s"trial $trial switch $switch: ${(out.toSet diff truth.toSet).take(3)}")
      }
    }
  }

  test("q101 guard: exhausting maxRounds throws instead of returning a wrong labeling") {
    val session = spark; import session.implicits._
    val chain = (1L to 29L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // 2 propagation rounds then a zero-round star budget: must fail loud
    val ex = intercept[IllegalStateException] {
      Dedup.clusterPairs(chain, maxRounds = 2, starSwitch = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("q101 end-to-end: near-dup pairs and exact copies land in one min-id cluster") {
    val session = spark; import session.implicits._
    val t = (1 to 44).map(i => s"t$i")
    val dir = tmpDir("dupclusters").toString
    Seq(
      1L -> t.slice(0, 40).mkString(" "),  // A  = t1..t40
      2L -> t.slice(0, 44).mkString(" "),  // B  = t1..t44 (j(A,B) ≈ 0.90)
      4L -> t.slice(0, 40).mkString(" "),  // A' = exact copy of A
      9L -> (1 to 30).map(i => s"z$i").mkString(" ") // unrelated: no rows
    ).toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = Dedup.dupClusters(spark, dir, Dedup.BucketCap)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 4L), s"doc 9 has no near-dup: ${out.keySet}")
    assert(out.values.forall { case (cid, n, _) => cid == 1L && n == 3L },
      s"one 3-doc cluster labeled by its min id: $out")
    assert(out.filter(_._2._3).keySet == Set(1L), s"only the min id keeps: $out")
  }

  test("q120 attribution conserves q101's removed docs and token mass exactly") {
    val clusters = graft.queries.Catalog.all("q101_dup_clusters")
      .build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    val removed = clusters.filter(!_._3)
    val docMeta = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "source", "size(split(text, ' ')) AS n_tok").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2).toLong))).toMap
    val attr = graft.queries.Catalog.all("q120_dedup_attribution")
      .build(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc and token totals conserve
    assert(attr.map(_._3).sum == removed.length.toLong)
    assert(attr.map(_._4).sum == removed.map(r => docMeta(r._1)._2).sum)
    // every edge re-derives from the cluster table
    val expected = removed
      .groupBy(r => (docMeta(r._2)._1, docMeta(r._1)._1))
      .map { case (k, rs) => k -> ((rs.length.toLong, rs.map(r => docMeta(r._1)._2).sum)) }
    assert(attr.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap == expected)
  }

  test("q101 truncation goes through a reliable checkpoint when the context has a dir") {
    val session = spark; import session.implicits._
    // production configuration: a checkpoint dir on reliable storage —
    // the truncate() helper must switch from localCheckpoint (executor-
    // resident) to checkpoint() (survives executor loss). Note: the dir
    // stays set on the shared context; later clusterPairs tests simply
    // keep using the reliable branch, which is correctness-neutral.
    val dir = tmpDir("cc-reliable")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val out = Dedup.clusterPairs(
      Seq((1L, 2L), (2L, 3L), (20L, 21L)).toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map(
      1L -> ((1L, 3L, true)), 2L -> ((1L, 3L, false)), 3L -> ((1L, 3L, false)),
      20L -> ((20L, 2L, true)), 21L -> ((20L, 2L, false))))
    val walked = java.nio.file.Files.walk(dir)
    val nCheckpointFiles = try walked.count() finally walked.close()
    assert(nCheckpointFiles > 1, "checkpoint dir must have received RDD data")
  }

  test("q101 checkpoint hygiene: superseded rounds deleted, final state retained") {
    val session = spark; import session.implicits._
    import scala.jdk.CollectionConverters._
    // a 30-node path forces ~4 propagation + ~5 star rounds; without
    // per-round rotation each one leaves an rdd-* directory on reliable
    // storage forever (cleanCheckpoints is non-default)
    val dir = tmpDir("cc-hygiene")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val chain = (1L to 29L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterPairs(chain)
    assert(out.collect().length == 30)
    def rddDirs: Seq[String] = {
      val w = java.nio.file.Files.walk(dir)
      try w.iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.matches("rdd-\\d+"))
        .map(_.getFileName.toString).toSeq
      finally w.close()
    }
    // survivors: verts + final star edges (≤ 3 with slack for the
    // checkpoint the final plan reads) — NOT one per round
    assert(rddDirs.size <= 3, s"stale round checkpoints left behind: $rddDirs")
    // the survivors back the returned plan: still evaluable after cleanup
    assert(out.collect().length == 30)
  }

  test("q106 fuzzy incremental: planted near-dups flagged, corpus bucket cap bounds matches") {
    val session = spark; import session.implicits._
    val t = (1 to 44).map(i => s"t$i")
    val a = t.slice(0, 40).mkString(" ")   // corpus text (5 copies)
    val b = t.slice(0, 44).mkString(" ")   // j(a,b) = 38/42 ≈ 0.905
    val dir = tmpDir("fuzzyinc").toString
    Seq(
      // corpus (doc_id % 10 < 8): five copies of a, one unrelated
      1L -> a, 10L -> a, 20L -> a, 30L -> a, 40L -> a,
      2L -> (1 to 30).map(i => s"z$i").mkString(" "),
      // incoming (doc_id % 10 >= 8): near-dup, unrelated, exact copy
      18L -> b,
      19L -> (1 to 30).map(i => s"y$i").mkString(" "),
      28L -> a)
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/documents.parquet")
    def run(cap: Int): Map[Long, (Int, Boolean)] =
      Dedup.fuzzyIncremental(spark, dir, cap).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    val out = run(Dedup.BucketCap)
    assert(out.keySet == Set(18L, 19L, 28L), "one row per incoming doc")
    assert(out(19L) == ((0, true)), s"unrelated must survive: $out")
    assert(out(18L) == ((5, false)), s"near-dup matches every corpus copy: $out")
    assert(out(28L) == ((5, false)), s"exact copy matches every corpus copy: $out")
    // cap=3 truncates the identical-text corpus bucket to its first 3
    // ids — matches are bounded but the verdict must not flip
    val capped = run(3)
    assert(capped(18L) == ((3, false)) && capped(28L) == ((3, false)), s"$capped")
    assert(capped(19L) == ((0, true)))
  }

  test("q44 bucket cap engaged: near-identical-vector cluster bounded at cap(cap-1)/2") {
    val k = 30; val cap = 5
    val dir = tmpDir("dedupcap-embed").toString
    val session = spark; import session.implicits._
    val dim = 8
    // plane region [EmbPlaneBase, EmbPlaneBase + EmbNumPlanes) must exist
    // in the corpus; seeded integer-valued planes are deterministic AND
    // exact in float arithmetic, so the in-test signature mirror below
    // cannot drift from the engine by a rounding ulp
    val rnd = new scala.util.Random(1)
    val planes = (Dedup.EmbPlaneBase.toLong until (Dedup.EmbPlaneBase + Dedup.EmbNumPlanes).toLong)
      .map(i => (i, Array.fill(dim)((rnd.nextInt(7) - 3).toFloat)))
    // DISTINCT near-identical vectors (a per-member 1e-4 jitter on one
    // coordinate): identical vectors would be collapsed by the exact-dup
    // pre-pass and never reach the buckets the cap guards. Sign
    // stability: base dots are nonzero integers (asserted below) and the
    // jitter shifts them by < 0.01, so every member shares the base
    // vector's buckets.
    val cluster = (100L until (100 + k).toLong)
      .map(i => (i, Array.tabulate(dim)(j =>
        if (j == 0) 1.0f + (i - 100) * 1e-4f else (j + 1).toFloat)))
    (planes ++ cluster).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    def run(c: Int): Set[(Long, Long)] =
      Dedup.embedNeardup(spark, dir, c)
        .filter(col("id_a") >= 100 && col("id_b") >= 100)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run(Int.MaxValue)
    val capped = run(cap)
    assert(uncapped.size == k * (k - 1) / 2, s"expected full clique, got ${uncapped.size}")

    // Plane rows (vec_id 8–39 < the cluster's 100+) can share the
    // cluster's band bucket and, sorting first, occupy slice slots.
    // The planes are formula vectors, so mirror the signature math in
    // plain Scala and predict the surviving cluster prefix exactly.
    val planeVecs = planes.map { case (i, a) => i -> a.map(_.toDouble) }.toMap
    val cv = Array.tabulate(dim)(j => (j + 1).toDouble)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // jitter-proof signatures require every base dot to be a nonzero
    // integer; if a future seed change breaks this, fail loudly here
    assert(planeVecs.values.forall(pv => math.abs(dot(cv, pv)) >= 1.0),
      "fixture planes must have nonzero integer dots with the cluster base")
    def bsig(v: Array[Double], band: Int): Long =
      (0 until Dedup.EmbBandBits).map { bit =>
        val pid = Dedup.EmbPlaneBase + band * Dedup.EmbBandBits + bit
        if (dot(v, planeVecs(pid)) > 0) 1L << bit else 0L
      }.sum
    val clusterSlots = (0 until Dedup.EmbBands).map { b =>
      val cb = bsig(cv, b)
      val planesInBucket = planeVecs.count { case (_, pv) => bsig(pv, b) == cb }
      (cap - planesInBucket).max(0)
    }
    val prefixLen = clusterSlots.max.min(k)
    info(s"cluster slots per band after plane crowding: $clusterSlots → prefix $prefixLen")
    assert(prefixLen >= 2 && prefixLen < k, "fixture must engage the cap yet keep some dupes")
    assert(capped == (for { a <- 100L until (100 + prefixLen).toLong
                            b <- a + 1 until (100 + prefixLen).toLong } yield (a, b)).toSet,
      s"capped result must be the predicted ${prefixLen}-prefix clique, got ${capped.size} pairs")
    assert(capped.subsetOf(uncapped) && capped.size < uncapped.size)
    assert(run(Dedup.BucketCap) == uncapped)
  }
}
