package graft

import org.apache.spark.sql.functions._

/** The q134-derived graph operators (q138 kNN outliers, q139 semantic
  * clusters, q140 triplet mining) against independent driver-side
  * reference recomputations from the same edge set — these pin the
  * REDUCTION logic; the edge set itself is pinned by AnnRecallSpec and
  * the hash-checked q134 oracle. Plus q141's NB classifier against a
  * from-scratch sequential reference over the raw fixture text.
  */
class GraphOpsSpec extends SparkSuite {

  private lazy val edges: Seq[(Long, Long, Double)] =
    graft.queries.Catalog.all("q134_knn_graph").build(spark, sf())
      .select(col("q_id"), col("n_id"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("q138 mean-kNN-cosine matches a driver recompute; flags are the global bottom-K") {
    val ref = edges.groupBy(_._1).map { case (v, es) =>
      val fs = es.map(e => math.floor(e._3 * 1048576.0).toLong).sum
      v -> (fs.toDouble / 1048576.0 / es.size)
    }
    val k = graft.queries.Similarity.OutlierK
    val flagged = ref.toSeq.sortBy { case (v, m) => (m, v) }.take(k).map(_._1).toSet
    val got = graft.queries.Catalog.all("q138_knn_outlier").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.length == ref.size, s"${got.length} rows vs ${ref.size} scored vectors")
    got.foreach { case (v, m, f) =>
      assert(math.abs(m - ref(v)) < 5e-5, s"vec $v: $m vs ${ref(v)}")
      assert(f == flagged(v), s"outlier flag mismatch at vec $v")
    }
    assert(flagged.size == k, s"exactly $k vectors must be flagged")
  }

  test("q139 clusters match a driver-side union-find over the thresholded edges") {
    val tau = graft.queries.Similarity.SemDedupTau
    val pairs = edges.filter(e => e._3 >= tau && e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    assert(pairs.nonEmpty, "fixture must produce >= 1 over-threshold edge")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val lbl = verts.map(v => v -> find(v)).toMap
    val sizes = lbl.values.groupBy(identity).map { case (l, vs) => l -> vs.size.toLong }
    val allIds = Tables(spark, sf(), "embeddings")
      .select(col("vec_id")).collect().map(_.getLong(0))
    val got = graft.queries.Catalog.all("q139_semantic_clusters").build(spark, sf())
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == allIds.toSet, "every vector must emit exactly one row")
    allIds.foreach { v =>
      val expL = lbl.getOrElse(v, v)
      val expS = if (lbl.contains(v)) sizes(expL) else 1L
      assert(got(v) == ((expL, expS, v == expL)), s"vec $v: ${got(v)}")
    }
  }

  test("q140 triplets match the per-anchor same/diff-label argmax over the edge set") {
    val labels = Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ref: Map[Long, (Int, Long, Double, Long, Double)] =
      edges.groupBy(_._1).flatMap { case (a, es) =>
        val same = es.filter(e => labels(e._2) == labels(a))
        val diff = es.filter(e => labels(e._2) != labels(a))
        if (same.isEmpty || diff.isEmpty) None
        else {
          def best(xs: Seq[(Long, Long, Double)]) = xs.maxBy(e => (e._3, -e._2))
          val (p, n) = (best(same), best(diff))
          Some(a -> ((labels(a), p._2, p._3, n._2, n._3)))
        }
      }
    val got = graft.queries.Catalog.all("q140_contrastive_pairs").build(spark, sf())
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(ref.nonEmpty, "fixture must yield >= 1 anchor with both a positive and a negative")
    assert(got == ref, s"triplet mismatch; e.g. ${(got.toSet -- ref.toSet).take(3)}")
  }

  test("q144 diversity sample = hash-ordered top-M of every q139 cluster") {
    def h32(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val clusters = graft.queries.Catalog.all("q139_semantic_clusters")
      .build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m = graft.queries.Similarity.ClusterSampleM
    val expected = clusters.groupBy(_._2).toSeq.flatMap { case (cid, members) =>
      members.sortBy(v => (h32(v._1), v._1)).take(m).zipWithIndex.map {
        case ((vid, _, sz), i) => (cid, vid, i + 1, sz)
      }.toSeq
    }.toSet
    val got = graft.queries.Catalog.all("q144_cluster_sample").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == expected, s"e.g. ${(got -- expected).take(3)}")
    // the sample caps multi-member clusters and keeps every singleton
    val multi = clusters.groupBy(_._2).count(_._2.length > m)
    info(s"clusters over the cap at sf0.001: $multi (of ${clusters.map(_._2).distinct.length})")
    assert(got.size == clusters.groupBy(_._2).values.map(g => math.min(g.size, m)).sum)
  }

  test("q148 fixed-point PageRank matches a sequential power iteration") {
    val iters = graft.queries.Similarity.PageRankIters
    val dir = edges.map(e => (e._1, e._2))
    val deg = dir.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val verts = Tables(spark, sf(), "embeddings")
      .select(col("vec_id")).collect().map(_.getLong(0))
    val n = math.max(verts.length.toLong, 1L)
    val r0 = 1048576L / n
    val base = (15L * r0) / 100L
    var rank = verts.map(_ -> r0).toMap
    (1 to iters).foreach { _ =>
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      dir.foreach { case (v, u) => contrib(u) += rank(v) / deg(v) }
      rank = verts.map(v => v -> (base + (85L * contrib(v)) / 100L)).toMap
    }
    val got = graft.queries.Catalog.all("q148_graph_rank").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == verts.length)
    got.foreach { case (v, fp, d) =>
      assert(fp == rank(v), s"vec $v: $fp vs ${rank(v)}")
      assert(d == fp.toDouble / 1048576.0)
    }
    // mass sanity: total rank stays near 2^20 (integer floors only lose)
    val mass = rank.values.sum
    assert(mass <= 1048576L && mass > 900000L, s"rank mass $mass out of range")
    info(s"rank mass after $iters rounds: $mass / 1048576; " +
      s"spread ${rank.values.min}..${rank.values.max}")
  }

  test("q141 NB classifier matches a sequential from-scratch reference") {
    val docs = Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    // split(" ", -1): Spark's split keeps trailing empty tokens; the
    // default Scala split drops them — tokenization must match exactly
    val toks = docs.map { case (id, s, t) => (id, s, t.split(" ", -1).toSeq) }
    val ctf = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    toks.foreach { case (_, s, ts) => ts.foreach(t => ctf((s, t)) += 1L) }
    val gtf = ctf.toSeq.groupBy(_._1._2).map { case (t, m) => t -> m.map(_._2).sum }
    val voc = gtf.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(graft.queries.TextAnalysis.VocabTopV).map(_._1).toSet
    val ctot = ctf.toSeq.groupBy(_._1._1).map { case (s, m) => s -> m.map(_._2).sum }
    val classDocs = docs.groupBy(_._2).map { case (s, d) => s -> d.length.toLong }
    val n = docs.length.toLong
    val classes = classDocs.keys.toSeq.sorted
    def cost(s: String, t: String): Long =
      if (voc(t) && ctf((s, t)) > 0) bits(ctot(s) / ctf((s, t))) else bits(ctot(s))
    val expected = toks.map { case (id, src, ts) =>
      val sc = classes.map(c =>
        (bits(n / classDocs(c)) + ts.map(t => cost(c, t)).sum, c)).sorted
      (id, src, sc.head._2, sc.head._1, sc(1)._1 - sc.head._1, sc.head._2 == src)
    }.toSet
    val got = graft.queries.Catalog.all("q141_nb_sourceid").build(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(got.size == docs.length, "one prediction row per doc")
    assert(got == expected, s"e.g. ${(got -- expected).take(3)}")
    val acc = expected.count(_._6).toDouble / expected.size
    info(f"NB source-id accuracy on the fixture: $acc%.2f over ${classes.size} classes")
  }

  test("nbScore refuses a degenerate single-class model") {
    val one = Seq(graft.queries.TextAnalysis.NbClass("only", 1L, 1L, Map.empty))
    val df = Tables(spark, sf(), "documents")
    assertThrows[IllegalArgumentException](
      graft.queries.TextAnalysis.nbScore(df, one))
  }
}
