package graft

import graft.queries.Catalog
import org.apache.spark.sql.functions._

/** Wall-time growth-exponent pins (round-16 verdict item 3).
  *
  * The sf0.1 fixture cannot expose a superlinear cost shape and the
  * duplicate-subtree lint can only see plan-structural recompute — an
  * entry that silently went quadratic (pair expansion past a cap, a
  * window group that grows with the corpus, an accidental self-join)
  * passes both. This spec MEASURES the shape: each pinned entry is
  * timed on three synthetic k×-scaled copies of its fact table (fresh
  * ids, the ScaleProbe recipe, built from sf0.01), and the delta-fitted
  * exponent must stay under the entry's pinned ceiling. A regression
  * fails with the measured exponent printed.
  *
  * Methodology notes:
  *  - the exponent is fitted on the DELTAS of THREE geometric scale
  *    points (k, b·k, b²·k): e = ln((t₃−t₂)/(t₂−t₁)) / ln(b). The
  *    per-build fixed cost (job scheduling, planning, the noop commit
  *    — ~0.3-0.8 s here, bigger than several entries' whole data term)
  *    cancels EXACTLY in the differences, where a two-point ratio fit
  *    dilutes the exponent toward 0 and would have let a quadratic
  *    data term hide under any usable ceiling (first cut measured
  *    e=0.29 on an entry whose data term grew 4× across a 4× scale —
  *    i.e. a clean e=1 read as 0.29);
  *  - min-of-N samples per point (host contention only ever ADDS time,
  *    so the min is the robust estimator — the Bench discipline);
  *  - one untimed warm-up build absorbs JIT + parquet-footer caching;
  *  - if either delta is under [[MinDeltaSec]] the exponent is
  *    overhead noise, not shape, and the entry is reported but not
  *    asserted (growth that small cannot be a scale problem at these
  *    point sizes);
  *  - ceilings leave noise margin over the design exponent (1.45 for
  *    linear-by-design entries): the failure mode being pinned against
  *    (quadratic) measures ~2 on this estimator.
  *
  * Documented exceptions: q124_semdedup and q139_semantic_clusters
  * are pinned at 2.6, not 1.45 — with the centroid count HELD FIXED
  * while the corpus scales, their cluster-local candidate/pairwise
  * stages grow Σ|c|² (the documented cost contract of both:
  * deployments must scale k with the corpus so |c| stays bounded;
  * q139's per-vector graft_topk bound makes the effect saturate at
  * larger scales — it measures ~1.9 at 2/4/8× and ~1.2 at 4/8/16×).
  * The q124 row doubles as the harness self-test that superlinear
  * shapes are visible to this probe at all (it measures ~1.9 at
  * 8/16/32× — clearly above every linear entry).
  */
class ScaleExponentSpec extends SparkSuite {

  private val Samples = 3
  private val MinDeltaSec = 0.15

  /** (entry, fact table, id column to shift, base scale k, point
    * factor b — points are k, b·k, b²·k — and the exponent ceiling).
    */
  private val Pins: Seq[(String, String, String, Int, Int, Double)] = Seq(
    ("q01_agg", "lineitem", "l_orderkey", 16, 4, 1.45),
    ("q41_dedup_minhash", "documents", "doc_id", 4, 4, 1.45),
    ("q43_ngram_jaccard", "documents", "doc_id", 8, 4, 1.5),
    ("q45_simhash_hamming", "documents", "doc_id", 4, 4, 1.45),
    ("q123_span_dup", "documents", "doc_id", 4, 4, 1.55),
    ("q162_active_users", "events", "user_id", 16, 4, 1.6),
    ("q97_incremental_dedup", "documents", "doc_id", 4, 4, 1.45),
    ("q125_bm25", "documents", "doc_id", 4, 4, 1.45),
    ("q139_semantic_clusters", "embeddings", "vec_id", 2, 2, 2.6),
    ("q124_semdedup", "embeddings", "vec_id", 8, 2, 2.6))

  private val base = sf("sf0.01")

  /** k× copies of `table` with ids shifted into disjoint blocks ABOVE
    * the originals (so seed/query selections like `vec_id < C` keep
    * hitting the original distinct rows — the ScaleProbe invariant).
    * Returns a dir usable as a Catalog sfDir for entries touching only
    * this table.
    *
    * Documents copies are token-salted (`_<i>` on every token): plain
    * copies collapse in the exact-dup stage every dedup entry opens
    * with, so an unsalted probe scales only the scan — the first cut
    * measured t16 == t4 on q41 because all 15 extra copies vanished at
    * the first aggregate. Salting makes every copy a DISTINCT document
    * (pairwise Jaccard 0 against all others), so the candidate
    * pipeline itself grows with k — what the exponent must see.
    */
  private def scaledDir(table: String, idCol: String, k: Int): String = {
    val dir = tmpDir(s"exp_${table}_$k").toString
    val src = Tables(spark, base, table)
    val block = src.agg(max(col(idCol))).head.getLong(0) + 1L
    val copies = src
      .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("__i"))
      .withColumn(idCol, col(idCol) + col("__i") * block)
    val out =
      if (table == "documents")
        copies
          .withColumn("text", array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_"), col("__i"))), " "))
          .withColumn("n_chars", length(col("text")))
      else copies
    out.drop("__i")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir
  }

  private def buildOnce(name: String, dir: String): Double = {
    // cold per sample: a persisted intermediate must not hand the next
    // sample a warm cache (the Bench discipline)
    spark.sharedState.cacheManager.clearCache()
    val t0 = System.nanoTime()
    Catalog.all(name).build(spark, dir)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def minOf(name: String, dir: String): Double =
    (1 to Samples).map(_ => buildOnce(name, dir)).min

  Pins.foreach { case (name, table, idCol, k, b, ceiling) =>
    val scales = Seq(k, k * b, k * b * b)
    test(s"$name wall-time growth exponent <= $ceiling over ${scales.mkString("/")}x $table") {
      val dirs = scales.map(s => scaledDir(table, idCol, s))
      buildOnce(name, dirs.head) // warm-up, untimed
      val ts = dirs.map(minOf(name, _))
      val (d1, d2) = (ts(1) - ts(0), ts(2) - ts(1))
      val exp = math.log(d2 / d1) / math.log(b.toDouble)
      val pts = scales.zip(ts)
        .map { case (s, t) => f"t$s=$t%.2fs" }.mkString(" ")
      info(f"$name: $pts deltas=$d1%.2f/$d2%.2f exponent=$exp%.2f (pin $ceiling)")
      if (d1 < MinDeltaSec || d2 < MinDeltaSec)
        info(s"$name: a scale delta is under ${MinDeltaSec}s — overhead " +
          "noise, not shape; exponent not asserted")
      else
        assert(exp <= ceiling,
          f"$name grew superlinearly: exponent $exp%.2f > pinned $ceiling ($pts)")
    }
  }
}
