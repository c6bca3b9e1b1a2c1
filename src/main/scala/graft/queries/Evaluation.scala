package graft.queries

import graft.Caches.TrackedPersist
import scala.collection.immutable.ListMap

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Model/pipeline EVALUATION statistics — the verbs that grade the other
  * verbs: ranking quality (AUC), probability calibration, chance-corrected
  * agreement (Cohen's kappa), monotone-trend detection (Mann–Kendall),
  * and rank correlation (Spearman). A curation pipeline that ships
  * classifiers (q141), heuristic gates (q60), quality scores (q61) and
  * anomaly monitors (q161/q174/q184) needs exactly these to decide
  * whether those components are any good — the reference engine ships
  * the components, never the scorecard.
  *
  * House arithmetic discipline throughout: every statistic is derived
  * from EXACT integer counts/moments (BIGINT all the way through the
  * distributed part), with the final real-valued statistic produced by
  * a FIXED, shared sequence of correctly-rounded IEEE ops (÷, ×, sqrt)
  * so Spark and DuckDB emit bit-identical doubles. No libm transcendentals
  * (not cross-engine stable), no per-row rounding (HALF_UP divergence).
  */
object Evaluation {

  /** q224's rank-discount table: milli-scaled 1/log2(rk+1) for rk =
    * 1..Bm25TopK, frozen as integer literals (single source of truth
    * for both engines — libm log2 is not cross-engine bit-stable, so
    * the metric is defined over THIS table). Regenerate via
    * round(1e6 / log2(rk + 1)) if Bm25TopK ever changes. Declared
    * BEFORE defs: the oracle string renders from it at object init.
    */
  val NdcgDiscountMilli: Seq[(Int, Long)] = Seq(
    1 -> 1000000L, 2 -> 630930L, 3 -> 500000L, 4 -> 430677L, 5 -> 386853L)

  /** q237's derived statistic: Brier = Σ((score−mn) − y·den)² /
    * (n·den²) — exact integer numerator, ONE shared IEEE op-DAG
    * (the OlsDerived discipline). Declared BEFORE defs (a val):
    * the oracle string renders from it at object init.
    */
  private val BrierDerived: Seq[String] = Seq(
    "CAST(sse AS DOUBLE) / (CAST(n_docs AS DOUBLE) * " +
      "CAST(den AS DOUBLE) * CAST(den AS DOUBLE)) AS brier")

  /** q241's per-bin decomposition terms — ONE canonical SQL text per
    * term, rendered into both engines (the OlsDerived discipline).
    * All inputs are exact BIGINTs at bin grain; each term is a fixed
    * IEEE DAG. p̄_b enters as s_b/(n_b·den), ȳ_b as y_b/n_b.
    */
  private val MurphyRelTerm: String = {
    val diff = "(CAST(s_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * " +
      "CAST(den AS DOUBLE)) - CAST(y_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    s"CAST(n_b AS DOUBLE) * ($diff * $diff) AS relterm"
  }
  private val MurphyResTerm: String = {
    val diff = "(CAST(y_b AS DOUBLE) / CAST(n_b AS DOUBLE) - " +
      "CAST(gy AS DOUBLE) / CAST(gn AS DOUBLE))"
    s"CAST(n_b AS DOUBLE) * ($diff * $diff) AS resterm"
  }
  private val MurphyWbvTerm: String =
    "CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) " +
      "AS wbvterm"
  private val MurphyCovTerm: String =
    "(CAST(spy_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(y_b AS DOUBLE) " +
      "/ CAST(n_b AS DOUBLE)) / CAST(den AS DOUBLE) AS covterm"

  /** q243's derived columns: capture (share of all positives in the
    * best-first cumulative), per-decile lift, cumulative lift — fixed
    * shared IEEE DAGs over the exact decile counts.
    */
  private val GainsDerived: Seq[String] = Seq(
    "CAST(cum_p AS DOUBLE) / CAST(gp AS DOUBLE) AS capture",
    "(CAST(p_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / " +
      "(CAST(gp AS DOUBLE) / CAST(gn AS DOUBLE)) AS lift",
    "(CAST(cum_p AS DOUBLE) / CAST(cum_n AS DOUBLE)) / " +
      "(CAST(gp AS DOUBLE) / CAST(gn AS DOUBLE)) AS cum_lift")

  /** q244's per-bin term and finals: ECE = Σ (n_b/n)·|p̄_b − ȳ_b|
    * (bin-ordered fold, the q241 mechanism), MCE = max |p̄_b − ȳ_b|
    * (order-free, no fold needed). One canonical text per term.
    */
  private val EceBinTerm: String = {
    val diff = "(CAST(s_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * " +
      "CAST(den AS DOUBLE)) - CAST(y_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    s"(CAST(n_b AS DOUBLE) / CAST(gn AS DOUBLE)) * abs($diff) AS eceterm"
  }
  private val MceBinTerm: String = {
    val diff = "(CAST(s_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * " +
      "CAST(den AS DOUBLE)) - CAST(y_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    s"abs($diff) AS mceterm"
  }

  /** q241's final statistics from the folded bin sums + the global
    * frame — shared verbatim by both engines. The five components
    * satisfy brier = wbv + rel − res + unc − 2·cov EXACTLY in real
    * arithmetic (the spec pins the float gap at ≤1e-12).
    */
  private val MurphyDerived: Seq[String] = Seq(
    "CAST(sse AS DOUBLE) / (CAST(gn AS DOUBLE) * CAST(den AS DOUBLE) * " +
      "CAST(den AS DOUBLE)) AS brier",
    "relsum / CAST(gn AS DOUBLE) AS reliability",
    "ressum / CAST(gn AS DOUBLE) AS resolution",
    "(CAST(gy AS DOUBLE) / CAST(gn AS DOUBLE)) * (CAST(1 AS DOUBLE) - " +
      "CAST(gy AS DOUBLE) / CAST(gn AS DOUBLE)) AS uncertainty",
    "(CAST(ssq AS DOUBLE) - wbvsum) / (CAST(gn AS DOUBLE) * " +
      "CAST(den AS DOUBLE) * CAST(den AS DOUBLE)) AS within_bin_var",
    "covsum / CAST(gn AS DOUBLE) AS within_bin_cov")

  /** q209's derived statistic: Pearson correlation over the (already
    * exact-integer) doubled midranks, from the five moments — rendered
    * into BOTH engines from this single template so the IEEE op DAG
    * cannot drift (q204's OlsDerived discipline; sqrt is IEEE-754
    * correctly rounded, hence bit-stable cross-engine).
    */
  private val SpearmanDerived: String = {
    val (n, sx, sy, sxx, syy, sxy) =
      ("CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)",
        "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)", "CAST(sxy AS DOUBLE)")
    s"($n * $sxy - $sx * $sy) / (sqrt($n * $sxx - $sx * $sx) * sqrt($n * $syy - $sy * $sy)) AS rho"
  }

  /** q216's derived statistic: tau-b from the exact concordance and
    * tie counts — rendered into both engines from this single template
    * (the q204 discipline). The positivity guard maps an all-tied
    * margin (zero denominator) to NULL instead of a NaN.
    */
  private val TauDerived: String = {
    val (c, dd) = ("CAST(n_conc AS DOUBLE)", "CAST(n_disc AS DOUBLE)")
    val vx = "CAST(n0 - n1 AS DOUBLE)"
    val vy = "CAST(n0 - n2 AS DOUBLE)"
    s"CASE WHEN $vx > 0.0 AND $vy > 0.0 THEN ($c - $dd) / (sqrt($vx) * sqrt($vy)) END AS tau_b"
  }

  val defs: ListMap[String, Q] = ListMap(

    // ---- ranking-quality AUC (Mann–Whitney with tie-halving): how well
    //      a per-doc score separates a binary label — the metric every
    //      learned quality filter is judged by before it gates a corpus.
    //      Exact: collapse to SCORE-VALUE grain (one hash agg), then
    //      2·U = Σ_s pos_s·(2·cum_neg_below + neg_s) — each positive
    //      scores 1 per negative strictly below and ½ per tied negative —
    //      all BIGINT (2U ≤ 2·n_pos·n_neg, sound to ~4e9 docs); AUC is
    //      ONE IEEE division. 100 TB shape: rows collapse to the score
    //      value-domain in a map-side-combinable agg; the cumulative runs
    //      over DISTINCT SCORES only (value-domain-bounded, q182's
    //      explicitly-admitted single-partition class — at a genuinely
    //      row-sized score domain, pre-bucket scores first, q206's grid).
    "q205_score_auc" -> Q(
      (s, d) => {
        val grain = Tables.spread(Tables(s, d, "documents"))
          .select(col("n_chars").as("score"),
            (col("lang") === "en").cast("long").as("is_pos"))
          .groupBy(col("score"))
          .agg(sum(col("is_pos")).as("pos_s"),
            sum(lit(1L) - col("is_pos")).as("neg_s"))
        val below = Window.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, -1)
        grain
          .withColumn("cum_neg_below",
            coalesce(sum(col("neg_s")).over(below), lit(0L)))
          .agg(sum(col("pos_s")).as("n_pos"), sum(col("neg_s")).as("n_neg"),
            sum(col("pos_s") * (lit(2L) * col("cum_neg_below") + col("neg_s")))
              .as("auc_num2"))
          .withColumn("auc", col("auc_num2").cast("double")
            / (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
      },
      Some("""WITH g AS (SELECT n_chars AS score,
             |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS pos_s,
             |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
             |      AS neg_s
             |  FROM documents GROUP BY 1),
             |c AS (SELECT pos_s, neg_s,
             |    CAST(coalesce(sum(neg_s) OVER (ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cum_neg_below
             |  FROM g)
             |SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
             |  CAST(sum(neg_s) AS BIGINT) AS n_neg,
             |  CAST(sum(pos_s * (2 * cum_neg_below + neg_s)) AS BIGINT)
             |    AS auc_num2,
             |  CAST(sum(pos_s * (2 * cum_neg_below + neg_s)) AS DOUBLE)
             |    / CAST(2 * sum(pos_s) * sum(neg_s) AS DOUBLE) AS auc
             |FROM c""".stripMargin)),

    // ---- calibration / reliability table: observed positive rate per
    //      equi-width score bin — whether a score MEANS what it claims
    //      (q205 grades ordering; this grades the values). Bin index is
    //      exact integer arithmetic on the broadcast (min, max) frame:
    //      (score−mn)·10 DIV (mx−mn+1) ∈ [0,9] — DIV on non-negative
    //      BIGINTs floors identically in both engines, no float boundary
    //      anywhere. 100 TB: one scan-stage projection + one 10-group
    //      hash agg; the (mn, mx) frame is a broadcast 1-row cross.
    "q206_calibration" -> Q(
      (s, d) => {
        val base = Tables.spread(Tables(s, d, "documents"))
          .select(col("n_chars").as("score"),
            (col("lang") === "en").cast("long").as("is_pos"))
        val mm = base.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
        base.crossJoin(broadcast(mm))
          .withColumn("bin",
            expr("CAST((score - mn) * 10 DIV (mx - mn + 1) AS BIGINT)"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("is_pos")).as("n_pos"),
            sum(col("score")).as("score_sum"))
          .select(col("bin"), col("n_docs"), col("n_pos"),
            (col("n_pos").cast("double") / col("n_docs").cast("double"))
              .as("pos_rate"),
            (col("score_sum").cast("double") / col("n_docs").cast("double"))
              .as("score_mean"))
      },
      Some("""WITH b AS (SELECT n_chars AS score,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos
             |  FROM documents),
             |mm AS (SELECT CAST(min(score) AS BIGINT) AS mn,
             |    CAST(max(score) AS BIGINT) AS mx FROM b)
             |SELECT CAST((score - mn) * 10 // (mx - mn + 1) AS BIGINT) AS bin,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(is_pos) AS BIGINT) AS n_pos,
             |  CAST(sum(is_pos) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS pos_rate,
             |  CAST(sum(score) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS score_mean
             |FROM b CROSS JOIN mm GROUP BY 1""".stripMargin)),

    // ---- Cohen's kappa: chance-corrected agreement between two
    //      labeling functions — here two independent "long document"
    //      raters (char-count ≥ 500 vs whitespace-token-count ≥ 90), the
    //      Snorkel-style diagnostic for whether weak labelers agree
    //      beyond what their marginal rates alone would produce (raw
    //      accuracy flatters skewed labels; a rater pair with one
    //      degenerate margin scores exactly 0 — the langid-vs-label
    //      pairing does on this fixture, which is why the entry rates
    //      raters with real signal: all four confusion cells are
    //      populated and kappa ≈ 0.87 at every sf).
    //      kappa = (N·Σdiag − Σ_l row_l·col_l) / (N² − Σ_l row_l·col_l):
    //      every term exact BIGINT from the #classes²-grain cell counts
    //      (N² sound to ~3e9 docs; past that widen the two products to
    //      DECIMAL(38) — the cell counts stay mergeable), ONE IEEE
    //      division. 100 TB: one corpus scan into a #classes²-grain hash
    //      agg; margins and the scalar frame are broadcast-sized.
    "q207_cohens_kappa" -> Q(
      (s, d) => {
        val cells = Tables.spread(Tables(s, d, "documents"))
          .select((col("n_chars") >= 500L).as("r1"),
            (size(split(col("text"), " ")) >= 90).as("r2"))
          .groupBy(col("r1"), col("r2"))
          .agg(count(lit(1)).as("n"))
        val tot = cells.agg(sum(col("n")).as("n_docs"),
          sum(when(col("r1") === col("r2"), col("n")).otherwise(0L))
            .as("n_agree"))
        val peNum = cells.groupBy(col("r1")).agg(sum(col("n")).as("row_n"))
          .join(cells.groupBy(col("r2")).agg(sum(col("n")).as("col_n")),
            col("r1") === col("r2"))
          .agg(sum(col("row_n") * col("col_n")).as("pe_num"))
        tot.crossJoin(broadcast(peNum))
          .select(col("n_docs"), col("n_agree"), col("pe_num"),
            ((col("n_docs") * col("n_agree") - col("pe_num")).cast("double")
              / (col("n_docs") * col("n_docs") - col("pe_num")).cast("double"))
              .as("kappa"))
      },
      Some("""WITH cells AS (SELECT n_chars >= 500 AS r1,
             |    len(string_split(text, ' ')) >= 90 AS r2,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
             |    CAST(sum(CASE WHEN r1 = r2 THEN n ELSE 0 END) AS BIGINT)
             |      AS n_agree
             |  FROM cells),
             |pe AS (SELECT CAST(sum(r.row_n * c.col_n) AS BIGINT) AS pe_num
             |  FROM (SELECT r1, CAST(sum(n) AS BIGINT) AS row_n
             |        FROM cells GROUP BY 1) r
             |  JOIN (SELECT r2, CAST(sum(n) AS BIGINT) AS col_n
             |        FROM cells GROUP BY 1) c ON r.r1 = c.r2)
             |SELECT n_docs, n_agree, pe_num,
             |  CAST(n_docs * n_agree - pe_num AS DOUBLE)
             |    / CAST(n_docs * n_docs - pe_num AS DOUBLE) AS kappa
             |FROM tot CROSS JOIN pe""".stripMargin)),

    // ---- Mann–Kendall trend test on daily event volume: S = Σ over day
    //      pairs of sign(n_later − n_earlier) — the NONPARAMETRIC "is
    //      this drifting monotonically" gate (q161 flags single-day
    //      spikes, q174/q184 track level shifts; MK catches a slow
    //      steady climb all three miss, with no distribution assumption
    //      and no variance estimate). Exact: S and the pair count are
    //      BIGINTs; tau-a = S / (n(n−1)/2) is ONE IEEE division.
    //      100 TB: rows collapse to DAY grain first (one hash agg — the
    //      only corpus-sized pass); the pair theta-join runs at day
    //      grain (#days ≈ tens..thousands, broadcast-sized both sides).
    "q208_trend_mk" -> Q(
      (s, d) => {
        // day-grain counts persist ONCE: both legs of the Mann–Kendall
        // pair join re-ran the corpus aggregate before round 16 (lint)
        val daily = Tables(s, d, "events")
          .select(expr("CAST(ts AS DATE)").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("n"))
          .persistTracked
        val pairs = daily.toDF("d1", "n1")
          .join(broadcast(daily.toDF("d2", "n2")), col("d1") < col("d2"))
        pairs.agg(
            count(lit(1)).as("n_pairs"),
            sum(signum(col("n2") - col("n1")).cast("long")).as("s_stat"))
          .select(col("n_pairs"), col("s_stat"),
            (col("s_stat").cast("double") / col("n_pairs").cast("double"))
              .as("tau"))
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(sum(sign(b.n - a.n)) AS BIGINT) AS s_stat,
             |  CAST(sum(sign(b.n - a.n)) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) AS tau
             |FROM daily a JOIN daily b ON a.day < b.day""".stripMargin)),

    // ---- Spearman rank correlation between per-customer order count
    //      and spend — "do heavy orderers spend more" as a MONOTONE
    //      (outlier-robust) association, where q204's OLS is linear and
    //      scale-sensitive. Ties use midranks; DOUBLED midranks stay
    //      integer (2·mid = 2·cum_below + c + 1 at value grain), so all
    //      five moments are exact BIGINTs (sound to ~3·10⁵ customers at
    //      these magnitudes — past that widen the moments to DECIMAL(38),
    //      they stay mergeable) and rho is the SpearmanDerived template:
    //      a fixed ÷/×/sqrt DAG, bit-identical cross-engine. Spend is
    //      bucketed to exact hundred-dollar BIGINTs (cents DIV 10⁴) —
    //      rank statistics on a bounded value domain, q182's discipline.
    //      100 TB: one orders scan → customer-grain agg; each rank map
    //      is a value-domain cumulative joined back by equi key; the
    //      moment collection is one hash agg.
    "q209_spearman" -> Q(
      (s, d) => {
        // customer-grain (x, y) profile persists ONCE: both rank maps
        // and the moment join re-scanned orders before round 16
        // (widened duplicate-aggregate lint finding; q216's rule)
        val per = Tables(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("x"),
            expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) DIV 10000 AS BIGINT)")
              .as("y"))
          .persistTracked
        def rank2(valueCol: String, out: String) = {
          val g = per.groupBy(col(valueCol).as("v"))
            .agg(count(lit(1)).as("c"))
          val below = Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, -1)
          g.withColumn("cum_below", coalesce(sum(col("c")).over(below), lit(0L)))
            .select(col("v"), (lit(2L) * col("cum_below") + col("c") + lit(1L))
              .as(out))
        }
        val ranked = per
          .join(rank2("x", "rx2"), col("x") === col("v")).drop("v")
          .join(rank2("y", "ry2"), col("y") === col("v")).drop("v")
        ranked
          .agg(count(lit(1)).as("n"), sum(col("rx2")).as("sx"),
            sum(col("ry2")).as("sy"),
            sum(col("rx2") * col("rx2")).as("sxx"),
            sum(col("ry2") * col("ry2")).as("syy"),
            sum(col("rx2") * col("ry2")).as("sxy"))
          .selectExpr("n", "sx", "sy", "sxx", "syy", "sxy", SpearmanDerived)
      },
      Some(s"""WITH per AS (SELECT o_custkey,
             |    CAST(count(*) AS BIGINT) AS x,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 10000
             |      AS BIGINT) AS y
             |  FROM orders GROUP BY 1),
             |gx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS c
             |  FROM per GROUP BY 1),
             |rx AS (SELECT v, 2 * CAST(coalesce(sum(c) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) + c + 1 AS rx2
             |  FROM gx),
             |gy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS c
             |  FROM per GROUP BY 1),
             |ry AS (SELECT v, 2 * CAST(coalesce(sum(c) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) + c + 1 AS ry2
             |  FROM gy),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(rx2) AS BIGINT) AS sx, CAST(sum(ry2) AS BIGINT) AS sy,
             |    CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
             |    CAST(sum(ry2 * ry2) AS BIGINT) AS syy,
             |    CAST(sum(rx2 * ry2) AS BIGINT) AS sxy
             |  FROM per JOIN rx ON per.x = rx.v JOIN ry ON per.y = ry.v)
             |SELECT n, sx, sy, sxx, syy, sxy, $SpearmanDerived
             |FROM m""".stripMargin)),

    // ---- grouped ranking AUC: q205 per SLICE (source) — the per-domain
    //      model scorecard (a quality filter that looks fine pooled can
    //      be inverted on one source; slice-level AUC is how that's
    //      caught). Same exact 2U arithmetic as q205, but the cumulative
    //      PARTITIONS by source — this is also the scale-correct form of
    //      the kernel: the window is (source × distinct-score)-grain and
    //      parallel across sources, no single-partition global pass at
    //      all. Degenerate slices (no positives or no negatives) emit
    //      auc = NULL via a 0-denominator guard rather than vanishing.
    "q213_grouped_auc" -> Q(
      (s, d) => {
        val grain = Tables.spread(Tables(s, d, "documents"))
          .select(col("source"), col("n_chars").as("score"),
            (col("lang") === "en").cast("long").as("is_pos"))
          .groupBy(col("source"), col("score"))
          .agg(sum(col("is_pos")).as("pos_s"),
            sum(lit(1L) - col("is_pos")).as("neg_s"))
        val below = Window.partitionBy(col("source")).orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, -1)
        grain
          .withColumn("cum_neg_below",
            coalesce(sum(col("neg_s")).over(below), lit(0L)))
          .groupBy(col("source"))
          .agg(sum(col("pos_s")).as("n_pos"), sum(col("neg_s")).as("n_neg"),
            sum(col("pos_s") * (lit(2L) * col("cum_neg_below") + col("neg_s")))
              .as("auc_num2"))
          .withColumn("auc",
            when(col("n_pos") > 0L && col("n_neg") > 0L,
              col("auc_num2").cast("double")
                / (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
      },
      Some("""WITH g AS (SELECT source, n_chars AS score,
             |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS pos_s,
             |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
             |      AS neg_s
             |  FROM documents GROUP BY 1, 2),
             |c AS (SELECT source, pos_s, neg_s,
             |    CAST(coalesce(sum(neg_s) OVER (PARTITION BY source
             |      ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cum_neg_below
             |  FROM g)
             |SELECT source, CAST(sum(pos_s) AS BIGINT) AS n_pos,
             |  CAST(sum(neg_s) AS BIGINT) AS n_neg,
             |  CAST(sum(pos_s * (2 * cum_neg_below + neg_s)) AS BIGINT)
             |    AS auc_num2,
             |  CASE WHEN sum(pos_s) > 0 AND sum(neg_s) > 0 THEN
             |    CAST(sum(pos_s * (2 * cum_neg_below + neg_s)) AS DOUBLE)
             |      / CAST(2 * sum(pos_s) * sum(neg_s) AS DOUBLE) END AS auc
             |FROM c GROUP BY 1""".stripMargin)),

    // ---- effective sample size of a weighted sample, per source: if
    //      docs are drawn proportional to an integer weight (here
    //      n_chars — token-proportional sampling, the packing-aware
    //      draw), ESS = (Σw)²/Σw² says how many EFFECTIVE docs the
    //      weighted draw carries, and ess_frac = ESS/n how much the
    //      weighting concentrates it — the importance-sampling health
    //      check every mixture/curriculum sampler (q92/q93/q121/q127)
    //      should report before training on the result. Exact: Σw and
    //      Σw² are BIGINTs (Σw·Σw sound while Σw < 3·10⁹, i.e. ~3 GB
    //      of chars per source; past that widen the product to
    //      DECIMAL(38) — sums stay mergeable); ess is ONE IEEE
    //      division, ess_frac one more on the pinned tree. 100 TB:
    //      one scan into a #sources-grain map-side-combinable hash agg.
    "q211_sampling_ess" -> Q(
      (s, d) => {
        Tables.spread(Tables(s, d, "documents"))
          .select(col("source"), col("n_chars").as("w"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("w_sum"),
            sum(col("w") * col("w")).as("w2_sum"))
          .select(col("source"), col("n_docs"), col("w_sum"), col("w2_sum"),
            ((col("w_sum") * col("w_sum")).cast("double")
              / col("w2_sum").cast("double")).as("ess"),
            (((col("w_sum") * col("w_sum")).cast("double")
              / col("w2_sum").cast("double"))
              / col("n_docs").cast("double")).as("ess_frac"))
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS w_sum,
             |  CAST(sum(n_chars * n_chars) AS BIGINT) AS w2_sum,
             |  CAST(CAST(sum(n_chars) AS BIGINT) * CAST(sum(n_chars) AS BIGINT)
             |      AS DOUBLE)
             |    / CAST(sum(n_chars * n_chars) AS DOUBLE) AS ess,
             |  CAST(CAST(sum(n_chars) AS BIGINT) * CAST(sum(n_chars) AS BIGINT)
             |      AS DOUBLE)
             |    / CAST(sum(n_chars * n_chars) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) AS ess_frac
             |FROM documents GROUP BY 1""".stripMargin)),

    // ---- Kendall tau-b at value grain: the tie-corrected concordance
    //      rank association between per-customer order count and spend
    //      bucket — q209's Spearman measures monotone fit through
    //      midranks; tau-b is the PAIR-concordance view (the statistic
    //      behind Kendall distance on rankings) and handles heavy ties
    //      through the n1/n2 corrections. Exact: rows collapse to the
    //      (x, y) CELL grain first (one hash agg), concordant/
    //      discordant mass comes from the cell-pair scan — Σ ca·cb over
    //      ordered cell pairs, BIGINT throughout (C + D ≤ n²/2, sound
    //      to ~4·10⁹ customers); tie terms n1/n2 from the margins; the
    //      statistic is the shared TauDerived ÷/×/sqrt template.
    //      100 TB: the pair scan is (#cells)², bounded by the VALUE
    //      domains (order-count × spend-bucket), never by rows — the
    //      same bucketing that bounds q209's rank grids.
    "q216_kendall_tau" -> Q(
      (s, d) => {
        // customer-grain (x, y) profile persists ONCE: the cell table,
        // the n count, and both tie margins are all re-aggregates of it
        // — pre-round-16 each re-scanned orders (lint finding)
        val per = Tables(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("x"),
            expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) DIV 10000 AS BIGINT)")
              .as("y"))
          .persistTracked
        val cells = per.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
        val a = cells.toDF("xa", "ya", "ca")
        val b = cells.toDF("xb", "yb", "cb")
        val pairs = a.join(broadcast(b),
          col("xa") < col("xb") ||
            (col("xa") === col("xb") && col("ya") < col("yb")))
        val cd = pairs.agg(
          sum(when(col("xa") < col("xb") && col("ya") < col("yb"),
            col("ca") * col("cb")).otherwise(0L)).as("n_conc"),
          sum(when(col("xa") < col("xb") && col("ya") > col("yb"),
            col("ca") * col("cb")).otherwise(0L)).as("n_disc"))
        // pair counts are exact integers: DIV, never `/` (Spark long
        // division is DOUBLE division)
        val marg = per.agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(per.groupBy(col("x")).agg(count(lit(1)).as("cx"))
            .agg(sum(expr("cx * (cx - 1) DIV 2")).as("n1"))))
          .crossJoin(broadcast(per.groupBy(col("y")).agg(count(lit(1)).as("cy"))
            .agg(sum(expr("cy * (cy - 1) DIV 2")).as("n2"))))
          .selectExpr("n", "n * (n - 1) DIV 2 AS n0", "n1", "n2")
        cd.crossJoin(broadcast(marg))
          .selectExpr("n", "n0", "n1", "n2", "n_conc", "n_disc", TauDerived)
      },
      Some(s"""WITH per AS (SELECT o_custkey,
             |    CAST(count(*) AS BIGINT) AS x,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 10000
             |      AS BIGINT) AS y
             |  FROM orders GROUP BY 1),
             |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
             |  FROM per GROUP BY 1, 2),
             |cd AS (SELECT
             |    CAST(sum(CASE WHEN a.x < b.x AND a.y < b.y
             |      THEN a.c * b.c ELSE 0 END) AS BIGINT) AS n_conc,
             |    CAST(sum(CASE WHEN a.x < b.x AND a.y > b.y
             |      THEN a.c * b.c ELSE 0 END) AS BIGINT) AS n_disc
             |  FROM cells a JOIN cells b
             |    ON a.x < b.x OR (a.x = b.x AND a.y < b.y)),
             |marg AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(*) AS BIGINT) * (CAST(count(*) AS BIGINT) - 1) // 2
             |      AS n0,
             |    (SELECT CAST(sum(cx * (cx - 1) // 2) AS BIGINT) FROM
             |      (SELECT CAST(count(*) AS BIGINT) AS cx FROM per GROUP BY x))
             |      AS n1,
             |    (SELECT CAST(sum(cy * (cy - 1) // 2) AS BIGINT) FROM
             |      (SELECT CAST(count(*) AS BIGINT) AS cy FROM per GROUP BY y))
             |      AS n2
             |  FROM per)
             |SELECT n, n0, n1, n2, n_conc, n_disc, $TauDerived
             |FROM cd CROSS JOIN marg""".stripMargin)),

    // ---- retrieval evaluation: precision@k, recall@k, and reciprocal
    //      rank per query over q125's BM25 top-k, judged against a
    //      deterministic relevance set (retrieved doc shares the query
    //      doc's `lang` — a judgment the lexical ranker can actually
    //      earn via shared-language token overlap; source-relevance was
    //      probed first and is signal-free on this fixture, all-zero
    //      metrics) — the scorecard for the retrieval stack
    //      (q125/q128/q132); without it a broken ranker still "returns
    //      results". Per-query rows only, no cross-query mean: P@k and
    //      recall are single IEEE divisions of exact counts and RR is
    //      exactly 1/first-relevant-rank (0 when none), while a MEAN of
    //      those doubles would be a row-order-dependent float sum —
    //      the one thing the house discipline forbids. 100 TB: rides
    //      the q125 ranking (already bounded-heap); judgments join k×Q
    //      rows to the broadcast query frame; the relevance-total arm
    //      is a lang-grain count joined to ≤Q rows.
    "q210_retrieval_eval" -> Q(
      (s, d) => {
        val ranked = TextAnalysis.bm25SelfRank(s, d)
        val src = Tables.spread(Tables(s, d, "documents"))
          .select(col("doc_id"), col("lang"))
        val qsrc = src.filter(col("doc_id") < TextAnalysis.Bm25Queries)
          .toDF("q_id", "q_lang")
        val per = ranked
          .join(broadcast(qsrc), "q_id")
          .join(src.toDF("n_id", "n_lang"), "n_id")
          .withColumn("rel", (col("q_lang") === col("n_lang")).cast("long"))
          .groupBy(col("q_id"))
          .agg(sum(col("rel")).as("n_rel"),
            min(when(col("rel") === 1L, col("rk"))).as("first_rel_rk"))
        val relTotal = src
          .join(broadcast(qsrc), col("lang") === col("q_lang")
            && col("doc_id") =!= col("q_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_rel_total"))
        // Anchor on the QUERY LIST, not on either metric arm: a query
        // with zero BM25 candidates (no token overlap anywhere — `per`
        // empty for it) and a query whose language has no other
        // document (n_rel_total = 0) must both still report. n_rel
        // coalesces to 0 (p@k = 0, rr = 0), recall is NULL only where
        // genuinely undefined (no relevant documents exist).
        qsrc.select(col("q_id"))
          .join(per, Seq("q_id"), "left")
          .join(relTotal, Seq("q_id"), "left")
          .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
          .withColumn("n_rel_total", coalesce(col("n_rel_total"), lit(0L)))
          .select(col("q_id"), col("n_rel"), col("n_rel_total"),
            (col("n_rel").cast("double")
              / lit(TextAnalysis.Bm25TopK.toLong).cast("double")).as("p_at_k"),
            when(col("n_rel_total") > 0L,
              col("n_rel").cast("double") / col("n_rel_total").cast("double"))
              .as("recall_at_k"),
            coalesce(lit(1.0) / col("first_rel_rk").cast("double"), lit(0.0))
              .as("rr"))
      },
      Some(s"""WITH ranked AS (${TextAnalysis.Bm25OracleSql}),
             |qsrc AS (SELECT doc_id AS q_id, lang AS q_lang
             |  FROM documents WHERE doc_id < ${TextAnalysis.Bm25Queries}),
             |judged AS (SELECT r.q_id, r.rk,
             |    CASE WHEN n.lang = q.q_lang THEN 1 ELSE 0 END AS rel
             |  FROM ranked r JOIN qsrc q USING (q_id)
             |  JOIN documents n ON n.doc_id = r.n_id),
             |per AS (SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel,
             |    min(CASE WHEN rel = 1 THEN rk END) AS first_rel_rk
             |  FROM judged GROUP BY 1),
             |rt AS (SELECT q.q_id, CAST(count(*) AS BIGINT) AS n_rel_total
             |  FROM documents d JOIN qsrc q
             |    ON d.lang = q.q_lang AND d.doc_id <> q.q_id
             |  GROUP BY 1)
             |SELECT q.q_id, CAST(coalesce(per.n_rel, 0) AS BIGINT) AS n_rel,
             |  CAST(coalesce(rt.n_rel_total, 0) AS BIGINT) AS n_rel_total,
             |  CAST(coalesce(per.n_rel, 0) AS DOUBLE)
             |    / CAST(CAST(${TextAnalysis.Bm25TopK} AS BIGINT) AS DOUBLE)
             |    AS p_at_k,
             |  CASE WHEN coalesce(rt.n_rel_total, 0) > 0
             |    THEN CAST(coalesce(per.n_rel, 0) AS DOUBLE)
             |      / CAST(rt.n_rel_total AS DOUBLE) END AS recall_at_k,
             |  coalesce(CAST(1.0 AS DOUBLE) / CAST(per.first_rel_rk AS DOUBLE),
             |    CAST(0.0 AS DOUBLE)) AS rr
             |FROM qsrc q LEFT JOIN per ON q.q_id = per.q_id
             |LEFT JOIN rt ON q.q_id = rt.q_id""".stripMargin)),

    // ---- nDCG@k over the q125 ranking — the standard ranking headline
    //      metric q210's P@k/recall/RR scorecard lacked. Gains are the
    //      q210 lang judgments (integer 0/1); the rank discounts
    //      1/log2(rk+1) are QUANTIZED to the milli-scaled integer
    //      table NdcgDiscountMilli (rendered into both engines from
    //      the one Seq — log2 itself is libm, not cross-engine
    //      bit-stable, so the metric is DEFINED over the quantized
    //      table; at k = 5 the quantization error is < 1e-6 relative,
    //      far below any decision threshold). DCG and IDCG are then
    //      exact BIGINT sums — IDCG over the first min(n_rel_total, k)
    //      discounts, the ideal ranking — and nDCG is ONE IEEE
    //      division, NULL only where no relevant document exists
    //      (IDCG = 0, undefined; the q210 degenerate-slice rule).
    //      Anchored on the query list like q210: zero-candidate
    //      queries report earned zeros. 100 TB: rides the bounded-heap
    //      q125 ranking; the discount join is a k-row broadcast; the
    //      IDCG arm is a ≤Q×k broadcast theta join at query grain.
    "q224_ndcg" -> Q(
      (s, d) => {
        import s.implicits._
        val ranked = TextAnalysis.bm25SelfRank(s, d)
        val src = Tables.spread(Tables(s, d, "documents"))
          .select(col("doc_id"), col("lang"))
        val qsrc = src.filter(col("doc_id") < TextAnalysis.Bm25Queries)
          .toDF("q_id", "q_lang")
        val wTab = NdcgDiscountMilli.toDF("rk", "w_milli")
        val dcg = ranked
          .join(broadcast(qsrc), "q_id")
          .join(src.toDF("n_id", "n_lang"), "n_id")
          .withColumn("rel", (col("q_lang") === col("n_lang")).cast("long"))
          .join(broadcast(wTab), "rk")
          .groupBy(col("q_id"))
          .agg(sum(col("rel") * col("w_milli")).as("dcg_milli"))
        val relTotal = src
          .join(broadcast(qsrc), col("lang") === col("q_lang")
            && col("doc_id") =!= col("q_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_rel_total"))
        val idcg = relTotal
          .join(broadcast(wTab),
            col("rk") <= least(col("n_rel_total"),
              lit(TextAnalysis.Bm25TopK.toLong)))
          .groupBy(col("q_id")).agg(sum(col("w_milli")).as("idcg_milli"))
        qsrc.select(col("q_id"))
          .join(dcg, Seq("q_id"), "left")
          .join(idcg, Seq("q_id"), "left")
          .withColumn("dcg_milli", coalesce(col("dcg_milli"), lit(0L)))
          .withColumn("idcg_milli", coalesce(col("idcg_milli"), lit(0L)))
          .select(col("q_id"), col("dcg_milli"), col("idcg_milli"),
            when(col("idcg_milli") > 0L,
              col("dcg_milli").cast("double") / col("idcg_milli").cast("double"))
              .as("ndcg"))
      },
      Some {
        val values = NdcgDiscountMilli
          .map { case (r, w) => s"($r, CAST($w AS BIGINT))" }.mkString(", ")
        s"""WITH ranked AS (${TextAnalysis.Bm25OracleSql}),
           |qsrc AS (SELECT doc_id AS q_id, lang AS q_lang
           |  FROM documents WHERE doc_id < ${TextAnalysis.Bm25Queries}),
           |w(rk, w_milli) AS (VALUES $values),
           |judged AS (SELECT r.q_id, r.rk,
           |    CASE WHEN n.lang = q.q_lang THEN 1 ELSE 0 END AS rel
           |  FROM ranked r JOIN qsrc q USING (q_id)
           |  JOIN documents n ON n.doc_id = r.n_id),
           |dcg AS (SELECT j.q_id,
           |    CAST(sum(j.rel * w.w_milli) AS BIGINT) AS dcg_milli
           |  FROM judged j JOIN w ON w.rk = j.rk GROUP BY 1),
           |rt AS (SELECT q.q_id, CAST(count(*) AS BIGINT) AS n_rel_total
           |  FROM documents d JOIN qsrc q
           |    ON d.lang = q.q_lang AND d.doc_id <> q.q_id
           |  GROUP BY 1),
           |idcg AS (SELECT rt.q_id,
           |    CAST(sum(w.w_milli) AS BIGINT) AS idcg_milli
           |  FROM rt JOIN w
           |    ON w.rk <= least(rt.n_rel_total,
           |      CAST(${TextAnalysis.Bm25TopK} AS BIGINT))
           |  GROUP BY 1)
           |SELECT q.q_id,
           |  CAST(coalesce(dcg.dcg_milli, 0) AS BIGINT) AS dcg_milli,
           |  CAST(coalesce(idcg.idcg_milli, 0) AS BIGINT) AS idcg_milli,
           |  CASE WHEN coalesce(idcg.idcg_milli, 0) > 0
           |    THEN CAST(coalesce(dcg.dcg_milli, 0) AS DOUBLE)
           |      / CAST(idcg.idcg_milli AS DOUBLE) END AS ndcg
           |FROM qsrc q LEFT JOIN dcg ON q.q_id = dcg.q_id
           |LEFT JOIN idcg ON q.q_id = idcg.q_id""".stripMargin
      }),

    // ---- average precision@k — the third standard ranking metric
    //      beside q210's P@k/RR and q224's nDCG: AP@k =
    //      (Σ_{hits} P@rank) / min(n_rel_total, k), rewarding EARLY
    //      hits with full positional weight where nDCG uses log
    //      discounts. Exact-integer trick: scale by 60 = lcm(1..5) —
    //      every positional precision P@i = cum_rel/i becomes the
    //      exact BIGINT (60 DIV i)·cum_rel (i divides 60 for all
    //      i ≤ k = 5), so the AP numerator sums exactly and the
    //      statistic is ONE IEEE division by the exact 60·min(nrt, k).
    //      Per-QUERY rows, never a cross-query mean (mAP is a
    //      row-order-dependent float sum — the house rule q210
    //      documents); NULL only where no relevant document exists.
    //      Anchored on the query list (q210's rule). 100 TB: rides the
    //      bounded-heap q125 ranking; the cum-rel window partitions by
    //      q_id over ≤ k rows per query.
    "q226_avg_precision" -> Q(
      (s, d) => {
        val ranked = TextAnalysis.bm25SelfRank(s, d)
        val src = Tables.spread(Tables(s, d, "documents"))
          .select(col("doc_id"), col("lang"))
        val qsrc = src.filter(col("doc_id") < TextAnalysis.Bm25Queries)
          .toDF("q_id", "q_lang")
        val w = Window.partitionBy(col("q_id")).orderBy(col("rk"))
        val per = ranked
          .join(broadcast(qsrc), "q_id")
          .join(src.toDF("n_id", "n_lang"), "n_id")
          .withColumn("rel", (col("q_lang") === col("n_lang")).cast("long"))
          .withColumn("cum_rel", sum(col("rel")).over(w))
          .groupBy(col("q_id"))
          .agg(sum(col("rel")).as("n_rel"),
            sum(when(col("rel") === 1L,
              expr("CAST(60 DIV rk AS BIGINT) * cum_rel"))
              .otherwise(0L)).as("ap60_num"))
        val relTotal = src
          .join(broadcast(qsrc), col("lang") === col("q_lang")
            && col("doc_id") =!= col("q_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_rel_total"))
        qsrc.select(col("q_id"))
          .join(per, Seq("q_id"), "left")
          .join(relTotal, Seq("q_id"), "left")
          .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
          .withColumn("ap60_num", coalesce(col("ap60_num"), lit(0L)))
          .withColumn("n_rel_total", coalesce(col("n_rel_total"), lit(0L)))
          .withColumn("denom60",
            lit(60L) * least(col("n_rel_total"),
              lit(TextAnalysis.Bm25TopK.toLong)))
          .select(col("q_id"), col("n_rel"), col("n_rel_total"),
            col("ap60_num"), col("denom60"),
            when(col("denom60") > 0L,
              col("ap60_num").cast("double") / col("denom60").cast("double"))
              .as("ap_at_k"))
      },
      Some(s"""WITH ranked AS (${TextAnalysis.Bm25OracleSql}),
             |qsrc AS (SELECT doc_id AS q_id, lang AS q_lang
             |  FROM documents WHERE doc_id < ${TextAnalysis.Bm25Queries}),
             |judged AS (SELECT r.q_id, r.rk,
             |    CASE WHEN n.lang = q.q_lang THEN 1 ELSE 0 END AS rel
             |  FROM ranked r JOIN qsrc q USING (q_id)
             |  JOIN documents n ON n.doc_id = r.n_id),
             |cum AS (SELECT q_id, rk, rel,
             |    CAST(sum(rel) OVER (PARTITION BY q_id ORDER BY rk) AS BIGINT)
             |      AS cum_rel
             |  FROM judged),
             |per AS (SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel,
             |    CAST(sum(CASE WHEN rel = 1
             |      THEN (60 // rk) * cum_rel ELSE 0 END) AS BIGINT)
             |      AS ap60_num
             |  FROM cum GROUP BY 1),
             |rt AS (SELECT q.q_id, CAST(count(*) AS BIGINT) AS n_rel_total
             |  FROM documents d JOIN qsrc q
             |    ON d.lang = q.q_lang AND d.doc_id <> q.q_id
             |  GROUP BY 1)
             |SELECT q.q_id,
             |  CAST(coalesce(per.n_rel, 0) AS BIGINT) AS n_rel,
             |  CAST(coalesce(rt.n_rel_total, 0) AS BIGINT) AS n_rel_total,
             |  CAST(coalesce(per.ap60_num, 0) AS BIGINT) AS ap60_num,
             |  CAST(60 * least(coalesce(rt.n_rel_total, 0),
             |    CAST(${TextAnalysis.Bm25TopK} AS BIGINT)) AS BIGINT)
             |    AS denom60,
             |  CASE WHEN coalesce(rt.n_rel_total, 0) > 0
             |    THEN CAST(coalesce(per.ap60_num, 0) AS DOUBLE)
             |      / CAST(60 * least(rt.n_rel_total,
             |          CAST(${TextAnalysis.Bm25TopK} AS BIGINT)) AS DOUBLE)
             |    END AS ap_at_k
             |FROM qsrc q LEFT JOIN per ON q.q_id = per.q_id
             |LEFT JOIN rt ON q.q_id = rt.q_id""".stripMargin)),

    // ---- BRIER score per source: the PROPER scoring rule the family's
    //      other two lenses don't give — q205's AUC sees only ranking
    //      (any monotone rescale leaves it fixed) and q206's
    //      calibration bins see only bin means; Brier = mean((p − y)²)
    //      punishes BOTH miscalibration and low sharpness (Murphy
    //      decomposition), so it catches a classifier AUC flatters.
    //      The score channel is q206's verbatim (min-max-normalized
    //      n_chars as P(lang = en)). Exactness: p = (score − mn)/den
    //      with den = mx − mn + 1 a GLOBAL 1-row frame, so
    //      (p − y)² = ((score − mn) − y·den)²/den² has an exact BIGINT
    //      numerator per row; the Σ accumulates in DECIMAL(38,0)
    //      (per-row ceiling den² ≈ 10¹² at the fixture's char range —
    //      corpus-sized groups clear 2⁶³, the q218 rule) and the ONE
    //      IEEE division per group comes from the shared template.
    //      100 TB: one 1-row (mn, mx) broadcast over the scan, one
    //      map-side-combinable source-grain aggregate.
    "q237_brier_score" -> Q(
      (s, d) => {
        val base = Tables.spread(Tables(s, d, "documents"))
          .select(col("source"), col("n_chars").as("score"),
            (col("lang") === "en").cast("long").as("y"))
        val mm = base.agg(min(col("score")).as("mn"),
          (max(col("score")) - min(col("score")) + 1L).as("den"))
        base.crossJoin(broadcast(mm))
          .select(col("source"), col("den"),
            (col("score") - col("mn") - col("y") * col("den")).as("r"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(expr("CAST(r * r AS DECIMAL(38,0))")).cast("long").as("sse"),
            min(col("den")).as("den"))
          .selectExpr(Seq("source", "n_docs", "sse") ++ BrierDerived: _*)
      },
      Some(s"""WITH b AS (SELECT source, n_chars AS score,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |mm AS (SELECT CAST(min(score) AS BIGINT) AS mn,
             |    CAST(max(score) - min(score) + 1 AS BIGINT) AS den FROM b),
             |m AS (SELECT source, den, score - mn - y * den AS r
             |  FROM b CROSS JOIN mm),
             |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(CAST(r * r AS DECIMAL(38,0))) AS BIGINT) AS sse,
             |    CAST(min(den) AS BIGINT) AS den
             |  FROM m GROUP BY 1)
             |SELECT source, n_docs, sse,
             |  ${BrierDerived.mkString(",\n             |  ")}
             |FROM g""".stripMargin)),

    // ---- MURPHY decomposition of the Brier score: reliability,
    //      resolution, uncertainty PLUS the two binning terms the
    //      textbook form drops (within-bin variance and within-bin
    //      score–label covariance), so the identity
    //      brier = wbv + rel − res + unc − 2·cov closes EXACTLY — the
    //      self-check that distinguishes an implemented decomposition
    //      from an approximated one (the spec pins the gap ≤1e-12;
    //      with continuous scores binned post-hoc the dropped terms
    //      are ~1e-3 here, larger than rel−res differences a model
    //      comparison would read). Bins are q206's deciles verbatim.
    //      Cross-engine exactness: every bin statistic is an exact
    //      BIGINT; each per-bin term is ONE shared IEEE DAG; the
    //      bin-ordered float folds use the seed-0 left fold ≡ DuckDB
    //      list_reduce equivalence (0.0 + t = t for the non-negative
    //      and non-(−0.0) terms these are). 100 TB: one corpus scan
    //      → decile-grain aggregate (map-side combinable); folds run
    //      over ≤10-element arrays; three 1-row broadcast crosses.
    "q241_brier_decomposition" -> Q(
      (s, d) => {
        val base = Tables.spread(Tables(s, d, "documents"))
          .select(col("n_chars").as("score"),
            (col("lang") === "en").cast("long").as("y"))
        val mm = base.agg(min(col("score")).as("mn"),
          (max(col("score")) - min(col("score")) + 1L).as("den"))
        val m = base.crossJoin(broadcast(mm))
          .select((col("score") - col("mn")).as("sc"), col("y"), col("den"),
            expr("CAST((score - mn) * 10 DIV den AS BIGINT)").as("bin"),
            (col("score") - col("mn") - col("y") * col("den")).as("r"))
        // ONE corpus pass to decile grain (the global moments carry as
        // extra per-bin partials, then re-sum — exact DECIMAL(38,0)
        // arithmetic is associative); pre-round-16 the global frame and
        // the bin table each re-scanned the corpus (lint finding)
        val bins = m.groupBy(col("bin"))
          .agg(count(lit(1)).as("n_b"), sum(col("sc")).as("s_b"),
            sum(col("y")).as("y_b"), sum(expr("sc * y")).as("spy_b"),
            sum(expr("CAST(r * r AS DECIMAL(38,0))")).as("sse_b"),
            sum(expr("CAST(sc * sc AS DECIMAL(38,0))")).as("ssq_b"),
            min(col("den")).as("den_b"))
          .persistTracked
        // coalesce: the oracle's gn is count(*) (0 on an empty corpus);
        // sum over zero bin rows is NULL — keep the 0-based degenerate
        // semantics the pre-round-16 global frame had
        val g = bins.agg(coalesce(sum(col("n_b")), lit(0L)).as("gn"),
          sum(col("y_b")).as("gy"),
          sum(col("sse_b")).cast("long").as("sse"),
          sum(col("ssq_b")).cast("long").as("ssq"),
          min(col("den_b")).as("den"))
        val t = bins.crossJoin(broadcast(g))
          .selectExpr(Seq("bin", MurphyRelTerm, MurphyResTerm,
            MurphyWbvTerm, MurphyCovTerm): _*)
        val fold = (f: String) =>
          s"aggregate(array_sort(h), CAST(0 AS DOUBLE), (a, x) -> a + x.$f)"
        t.agg(collect_list(struct(col("bin"), col("relterm"), col("resterm"),
            col("wbvterm"), col("covterm"))).as("h"),
            count(lit(1)).as("n_bins"))
          .select(col("n_bins"), expr(fold("relterm")).as("relsum"),
            expr(fold("resterm")).as("ressum"),
            expr(fold("wbvterm")).as("wbvsum"),
            expr(fold("covterm")).as("covsum"))
          .crossJoin(broadcast(g))
          .selectExpr(Seq("gn AS n_docs", "n_bins") ++ MurphyDerived: _*)
      },
      Some(s"""WITH b AS (SELECT n_chars AS score,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |mm AS (SELECT CAST(min(score) AS BIGINT) AS mn,
             |    CAST(max(score) - min(score) + 1 AS BIGINT) AS den FROM b),
             |m AS (SELECT score - mn AS sc, y, den,
             |    CAST((score - mn) * 10 // den AS BIGINT) AS bin,
             |    score - mn - y * den AS r FROM b CROSS JOIN mm),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS gn,
             |    CAST(sum(y) AS BIGINT) AS gy,
             |    CAST(sum(CAST(r * r AS DECIMAL(38,0))) AS BIGINT) AS sse,
             |    CAST(sum(CAST(sc * sc AS DECIMAL(38,0))) AS BIGINT) AS ssq,
             |    CAST(min(den) AS BIGINT) AS den FROM m),
             |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
             |    CAST(sum(sc) AS BIGINT) AS s_b,
             |    CAST(sum(y) AS BIGINT) AS y_b,
             |    CAST(sum(sc * y) AS BIGINT) AS spy_b FROM m GROUP BY 1),
             |t AS (SELECT bin, $MurphyRelTerm, $MurphyResTerm,
             |    $MurphyWbvTerm, $MurphyCovTerm FROM bins CROSS JOIN g),
             |f AS (SELECT
             |    list_reduce(list(relterm ORDER BY bin), (a, c) -> a + c)
             |      AS relsum,
             |    list_reduce(list(resterm ORDER BY bin), (a, c) -> a + c)
             |      AS ressum,
             |    list_reduce(list(wbvterm ORDER BY bin), (a, c) -> a + c)
             |      AS wbvsum,
             |    list_reduce(list(covterm ORDER BY bin), (a, c) -> a + c)
             |      AS covsum,
             |    CAST(count(*) AS BIGINT) AS n_bins FROM t)
             |SELECT gn AS n_docs, n_bins,
             |  ${MurphyDerived.mkString(",\n             |  ")}
             |FROM f CROSS JOIN g""".stripMargin)),

    // ---- GAINS / LIFT table: the model-eval artifact AUC and
    //      calibration don't give — per score decile (best-first), how
    //      much of the positive class the top-k deciles CAPTURE and
    //      the decile's lift over the base rate; the targeting /
    //      sample-selection readout (send the crawler to the top-2
    //      deciles ⇒ capture tells you the recall you bought). Bins
    //      are q206's deciles verbatim; counts are exact BIGINTs; the
    //      cumulative runs best-first over the ≤10-row decile grain
    //      (an intentional global window — value-domain-bounded by
    //      construction); capture/lift are fixed shared IEEE DAGs.
    //      100 TB: one corpus scan → decile hash-agg; everything after
    //      is ≤10 rows + a 1-row broadcast frame.
    "q243_gains_table" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.spread(Tables(s, d, "documents"))
          .select(col("n_chars").as("score"),
            (col("lang") === "en").cast("long").as("y"))
        val mm = base.agg(min(col("score")).as("mn"),
          (max(col("score")) - min(col("score")) + 1L).as("den"))
        val m = base.crossJoin(broadcast(mm))
          .select(expr("CAST((score - mn) * 10 DIV den AS BIGINT)").as("bin"),
            col("y"))
        val g = m.agg(count(lit(1)).as("gn"), sum(col("y")).as("gp"))
        val w = Window.orderBy(col("bin").desc)
        m.groupBy(col("bin"))
          .agg(count(lit(1)).as("n_b"), sum(col("y")).as("p_b"))
          .withColumn("cum_n", sum(col("n_b")).over(w))
          .withColumn("cum_p", sum(col("p_b")).over(w))
          .crossJoin(broadcast(g))
          .selectExpr(Seq("bin", "n_b", "p_b", "cum_n", "cum_p")
            ++ GainsDerived: _*)
      },
      Some(s"""WITH b AS (SELECT n_chars AS score,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |mm AS (SELECT CAST(min(score) AS BIGINT) AS mn,
             |    CAST(max(score) - min(score) + 1 AS BIGINT) AS den FROM b),
             |m AS (SELECT CAST((score - mn) * 10 // den AS BIGINT) AS bin, y
             |  FROM b CROSS JOIN mm),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS gn,
             |    CAST(sum(y) AS BIGINT) AS gp FROM m),
             |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
             |    CAST(sum(y) AS BIGINT) AS p_b FROM m GROUP BY 1),
             |cum AS (SELECT bin, n_b, p_b,
             |    CAST(sum(n_b) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_n,
             |    CAST(sum(p_b) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_p
             |  FROM bins)
             |SELECT bin, n_b, p_b, cum_n, cum_p,
             |  ${GainsDerived.mkString(",\n             |  ")}
             |FROM cum CROSS JOIN g""".stripMargin)),

    // ---- EXPECTED / MAXIMUM CALIBRATION ERROR: the two scalars a
    //      calibration DASHBOARD wants next to q206's bin table and
    //      q241's decomposition — ECE is the count-weighted mean
    //      |confidence − accuracy| gap over the deciles (the number
    //      model cards report), MCE the worst bin's gap (the number
    //      an SLA bounds). ECE folds bin-ordered (the q241 mechanism —
    //      ordered float sums are bit-identical cross-engine); MCE is
    //      a plain max over per-bin doubles (order-free). Deciles,
    //      counts, and the per-bin gap DAG are q206/q241's verbatim.
    //      100 TB: one corpus scan → decile hash-agg → a ≤10-element
    //      fold; two 1-row broadcast crosses.
    "q244_calibration_error" -> Q(
      (s, d) => {
        val base = Tables.spread(Tables(s, d, "documents"))
          .select(col("n_chars").as("score"),
            (col("lang") === "en").cast("long").as("y"))
        val mm = base.agg(min(col("score")).as("mn"),
          (max(col("score")) - min(col("score")) + 1L).as("den"))
        val m = base.crossJoin(broadcast(mm))
          .select((col("score") - col("mn")).as("sc"), col("y"), col("den"),
            expr("CAST((score - mn) * 10 DIV den AS BIGINT)").as("bin"))
        // ONE corpus pass to decile grain (q241's rule): the global
        // frame re-sums exact per-bin partials instead of re-scanning
        // (widened duplicate-aggregate lint finding)
        val bins = m.groupBy(col("bin"))
          .agg(count(lit(1)).as("n_b"), sum(col("sc")).as("s_b"),
            sum(col("y")).as("y_b"), min(col("den")).as("den_b"))
          .persistTracked
        // coalesce for the same empty-corpus reason as q241's gn above
        val g = bins.agg(coalesce(sum(col("n_b")), lit(0L)).as("gn"),
          min(col("den_b")).as("den"))
        bins
          .crossJoin(broadcast(g))
          .selectExpr("bin", EceBinTerm, MceBinTerm)
          .agg(collect_list(struct(col("bin"), col("eceterm"))).as("h"),
            max(col("mceterm")).as("mce"), count(lit(1)).as("n_bins"))
          .crossJoin(broadcast(g.select(col("gn"))))
          .select(col("gn").as("n_docs"), col("n_bins"),
            expr("aggregate(array_sort(h), CAST(0 AS DOUBLE), " +
              "(a, x) -> a + x.eceterm)").as("ece"),
            col("mce"))
      },
      Some(s"""WITH b AS (SELECT n_chars AS score,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |mm AS (SELECT CAST(min(score) AS BIGINT) AS mn,
             |    CAST(max(score) - min(score) + 1 AS BIGINT) AS den FROM b),
             |m AS (SELECT score - mn AS sc, y, den,
             |    CAST((score - mn) * 10 // den AS BIGINT) AS bin
             |  FROM b CROSS JOIN mm),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS gn,
             |    CAST(min(den) AS BIGINT) AS den FROM m),
             |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
             |    CAST(sum(sc) AS BIGINT) AS s_b,
             |    CAST(sum(y) AS BIGINT) AS y_b FROM m GROUP BY 1),
             |t AS (SELECT bin, $EceBinTerm, $MceBinTerm
             |  FROM bins CROSS JOIN g)
             |SELECT (SELECT gn FROM g) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS n_bins,
             |  list_reduce(list(eceterm ORDER BY bin), (a, c) -> a + c)
             |    AS ece,
             |  max(mceterm) AS mce
             |FROM t""".stripMargin))
  )
}
