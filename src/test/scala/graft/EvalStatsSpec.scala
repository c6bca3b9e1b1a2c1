package graft

import org.apache.spark.sql.functions._

/** The evaluation-statistics family vs brute-force driver-side
  * references at sf0.001: q205 (AUC over ALL pos/neg pairs), q206
  * (per-bin recount), q207 (kappa from an independent two-rater
  * confusion recount), q208 (Mann–Kendall S over all day pairs), q209
  * (Spearman via plain midranks + double-precision Pearson). References
  * never touch the query's own plan — plain Scala loops over collected
  * fixture rows.
  */
class EvalStatsSpec extends SparkSuite {

  private def docs() = Tables(spark, sf(), "documents")
    .select(col("n_chars"), col("lang"), col("text")).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q205: grouped AUC equals the all-pairs Mann–Whitney ground truth") {
    val d = docs()
    val pos = d.filter(_._2 == "en").map(_._1)
    val neg = d.filter(_._2 != "en").map(_._1)
    var num2 = 0L
    for (p <- pos; n <- neg)
      num2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val expected = num2.toDouble / (2.0 * pos.length * neg.length)

    val row = graft.queries.Catalog.all("q205_score_auc")
      .build(spark, sf()).collect().head
    assert(row.getLong(0) == pos.length && row.getLong(1) == neg.length)
    assert(row.getLong(2) == num2, s"2U: got ${row.getLong(2)}, want $num2")
    assert(row.getDouble(3) == expected)
  }

  test("q206: every calibration bin matches a recount") {
    val d = docs().map(t => (t._1, t._2 == "en"))
    val mn = d.map(_._1).min
    val mx = d.map(_._1).max
    val byBin = d.groupBy(t => (t._1 - mn) * 10L / (mx - mn + 1L))
    val got = graft.queries.Catalog.all("q206_calibration")
      .build(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == byBin.keySet)
    byBin.foreach { case (bin, rows) =>
      assert(got(bin) == ((rows.length.toLong, rows.count(_._2).toLong)),
        s"bin $bin: got ${got(bin)}")
    }
  }

  test("q207: kappa equals the two-rater confusion ground truth") {
    val d = docs().map(t => (t._1 >= 500L, t._3.split(" ", -1).length >= 90))
    val n = d.length.toLong
    val agree = d.count(t => t._1 == t._2).toLong
    val rowN = d.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colN = d.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val peNum = rowN.map { case (l, r) => r * colN.getOrElse(l, 0L) }.sum
    val expected = (n * agree - peNum).toDouble / (n * n - peNum).toDouble

    val row = graft.queries.Catalog.all("q207_cohens_kappa")
      .build(spark, sf()).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == agree
      && row.getLong(2) == peNum, s"moments: $row")
    assert(row.getDouble(3) == expected)
    // the statistic must be informative on the fixture: the raters
    // agree beyond chance but not perfectly (all four cells populated)
    assert(row.getDouble(3) > 0.5 && row.getDouble(3) < 1.0)
    val cells = d.groupBy(identity).size
    assert(cells == 4, s"fixture must populate all four confusion cells: $cells")
  }

  test("q208: S equals the all-day-pairs sign sum") {
    val daily = Tables(spark, sf(), "events")
      .select(expr("CAST(ts AS DATE)").as("day")).groupBy("day").count()
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).sortBy(_._1)
    var s = 0L; var pairs = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      pairs += 1
      s += java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong
    }
    val row = graft.queries.Catalog.all("q208_trend_mk")
      .build(spark, sf()).collect().head
    assert(row.getLong(0) == pairs && row.getLong(1) == s, s"got $row")
    assert(row.getDouble(2) == s.toDouble / pairs.toDouble)
  }

  test("q210: metrics equal a plain-loop judgment of the q125 ranking") {
    // boundary: the RANKING is q125's (itself oracle-verified); what
    // q210 adds — judgment + P@k/recall/RR — is recomputed here with
    // scalar loops
    val langOf = Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ranked = graft.queries.Catalog.all("q125_bm25").build(spark, sf())
      .select("q_id", "n_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val k = graft.queries.TextAnalysis.Bm25TopK
    val got = graft.queries.Catalog.all("q210_retrieval_eval")
      .build(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    ranked.groupBy(_._1).foreach { case (q, rows) =>
      val rel = rows.filter(t => langOf(t._2) == langOf(q))
      val nRelTotal = langOf.count { case (d, l) => d != q && l == langOf(q) }.toLong
      val rr = if (rel.isEmpty) 0.0 else 1.0 / rel.map(_._3).min
      val expect = (rel.length.toLong, nRelTotal,
        rel.length.toDouble / k.toDouble,
        rel.length.toDouble / nRelTotal.toDouble, rr)
      assert(got(q) == expect, s"q$q: got ${got(q)}, want $expect")
    }
    // the fixture must exercise hits, a miss, and a rank-1 hit
    val rrs = got.values.map(_._5).toSeq
    assert(rrs.contains(0.0) && rrs.contains(1.0) && rrs.exists(r => r > 0 && r < 1),
      s"RR arms not all exercised: $rrs")
  }

  test("q210: a query whose language is unique still reports, with NULL recall") {
    import spark.implicits._
    // ADVICE r12: the inner join to the relevance-total arm silently
    // dropped a query with n_rel_total = 0; now a LEFT join emits it
    // with recall_at_k NULL (undefined) and p@k / rr as usual
    val dir = tmpDir("q210_degenerate").toString
    val docs = (0L until 12L).map { i =>
      val lang = if (i == 3L) "zz" else if (i % 2 == 0) "en" else "de"
      val text = s"alpha bravo charlie token$i shared words corpus line"
      (i, text, lang, s"src${i % 3}", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = graft.queries.Catalog.all("q210_retrieval_eval")
      .build(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // all 5 query docs report — including doc 3, the unique-lang one
    assert(got.keySet == (0L until 5L).toSet, s"rows dropped: ${got.keySet}")
    val r3 = got(3L)
    assert(r3.getLong(1) == 0L && r3.getLong(2) == 0L,
      s"doc 3 must have n_rel = n_rel_total = 0: $r3")
    assert(r3.getDouble(3) == 0.0, s"p@k well-defined: $r3")
    assert(r3.isNullAt(4), s"recall must be NULL on the degenerate slice: $r3")
    assert(r3.getDouble(5) == 0.0, s"rr well-defined: $r3")
    // non-degenerate queries still carry a non-NULL recall
    assert((0L until 5L).filter(_ != 3L).forall(q => !got(q).isNullAt(4)))
  }

  test("q210: a query with zero BM25 candidates still reports all-zero metrics") {
    import spark.implicits._
    // ADVICE r13: anchoring the final select on `per` (the judged
    // ranking) silently dropped a query that retrieved NOTHING — no
    // token overlap with any other document. The qsrc anchor emits it
    // with n_rel = 0, p@k = 0, rr = 0, and recall = 0 (its language
    // has other docs, so recall is defined and earned as zero).
    val dir = tmpDir("q210_nocand").toString
    val docs = (0L until 12L).map { i =>
      val text =
        if (i == 2L) "qqqq wwww eeee rrrr tttt yyyy uuuu iiii"
        else s"alpha bravo charlie token$i shared words corpus line"
      (i, text, if (i % 2 == 0) "en" else "de", s"src${i % 3}",
        text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // precondition: the ranking really has no rows for query 2
    val ranked = graft.queries.Catalog.all("q125_bm25").build(spark, dir)
      .filter(col("q_id") === 2L).count()
    assert(ranked == 0L, s"fixture must starve query 2 of candidates: $ranked")
    val got = graft.queries.Catalog.all("q210_retrieval_eval")
      .build(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == (0L until 5L).toSet, s"rows dropped: ${got.keySet}")
    val r2 = got(2L)
    assert(r2.getLong(1) == 0L, s"n_rel must be 0: $r2")
    assert(r2.getLong(2) > 0L, s"other en docs exist, recall defined: $r2")
    assert(r2.getDouble(3) == 0.0 && r2.getDouble(4) == 0.0
      && r2.getDouble(5) == 0.0, s"metrics must be earned zeros: $r2")
    // the rest of the scorecard is unaffected by the anchor change
    assert((0L until 5L).filter(_ != 2L).forall(q => got(q).getLong(1) > 0L))
  }

  test("q224: nDCG equals a plain-loop recount over the q125 ranking") {
    val langOf = Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ranked = graft.queries.Catalog.all("q125_bm25").build(spark, sf())
      .select("q_id", "n_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val w = graft.queries.Evaluation.NdcgDiscountMilli.toMap
    val k = graft.queries.TextAnalysis.Bm25TopK
    val byQ = ranked.groupBy(_._1)
    val got = graft.queries.Catalog.all("q224_ndcg")
      .build(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val queries = langOf.keys.filter(_ < graft.queries.TextAnalysis.Bm25Queries)
    assert(got.keySet == queries.toSet)
    queries.foreach { q =>
      val dcg = byQ.getOrElse(q, Array.empty[(Long, Long, Int)])
        .filter(t => langOf(t._2) == langOf(q)).map(t => w(t._3)).sum
      val nRelTotal = langOf.count { case (d0, l) => d0 != q && l == langOf(q) }
      val idcg = (1 to math.min(nRelTotal, k)).map(w).sum
      val ndcg = if (idcg > 0) Some(dcg.toDouble / idcg.toDouble) else None
      assert(got(q) == ((dcg, idcg, ndcg)), s"q$q: got ${got(q)}, want ($dcg, $idcg, $ndcg)")
    }
    // the statistic must discriminate on the fixture (not all equal)
    val vals = got.values.flatMap(_._3).toSeq
    assert(vals.distinct.size > 1, s"nDCG must vary across queries: $vals")
  }

  test("q226: AP@k equals a plain-loop recount over the q125 ranking") {
    val langOf = Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ranked = graft.queries.Catalog.all("q125_bm25").build(spark, sf())
      .select("q_id", "n_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val k = graft.queries.TextAnalysis.Bm25TopK
    val got = graft.queries.Catalog.all("q226_avg_precision")
      .build(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    val queries = langOf.keys.filter(_ < graft.queries.TextAnalysis.Bm25Queries)
    assert(got.keySet == queries.toSet)
    queries.foreach { q =>
      val rows = ranked.filter(_._1 == q).sortBy(_._3)
      var cum = 0L; var ap60 = 0L; var nRel = 0L
      rows.foreach { case (_, nid, rk) =>
        if (langOf(nid) == langOf(q)) {
          cum += 1; nRel += 1
          ap60 += (60L / rk) * cum
        }
      }
      val nrt = langOf.count { case (d0, l) => d0 != q && l == langOf(q) }.toLong
      val denom = 60L * math.min(nrt, k.toLong)
      val ap = if (denom > 0) Some(ap60.toDouble / denom.toDouble) else None
      assert(got(q) == ((nRel, nrt, ap60, denom, ap)),
        s"q$q: got ${got(q)}, want ($nRel, $nrt, $ap60, $denom, $ap)")
    }
    // positional sensitivity must show on the fixture: AP values vary
    val vals = got.values.flatMap(_._5).toSeq
    assert(vals.distinct.size > 1, s"AP must vary across queries: $vals")
  }

  test("q213: every per-source AUC equals the all-pairs ground truth") {
    val bySrc = Tables(spark, sf(), "documents")
      .select(col("source"), col("n_chars"), col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "en"))
      .groupBy(_._1)
    val got = graft.queries.Catalog.all("q213_grouped_auc")
      .build(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val pos = rows.filter(_._3).map(_._2); val neg = rows.filterNot(_._3).map(_._2)
      var num2 = 0L
      for (p <- pos; n <- neg)
        num2 += (if (p > n) 2L else if (p == n) 1L else 0L)
      val auc = if (pos.nonEmpty && neg.nonEmpty)
        Some(num2.toDouble / (2.0 * pos.length * neg.length)) else None
      assert(got(src) == ((pos.length.toLong, neg.length.toLong, num2, auc)),
        s"$src: got ${got(src)}")
    }
  }

  test("q211: per-source ESS equals the scalar recount") {
    val bySrc = Tables(spark, sf(), "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val got = graft.queries.Catalog.all("q211_sampling_ess")
      .build(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val ws = rows.map(_._2)
      val (n, s1, s2) = (ws.length.toLong, ws.sum, ws.map(w => w * w).sum)
      val ess = (s1 * s1).toDouble / s2.toDouble
      assert(got(src) == ((n, s1, s2, ess, ess / n.toDouble)),
        s"$src: ${got(src)}")
      // weights must actually concentrate (ESS < n) or the diagnostic
      // is vacuous on this fixture
      assert(got(src)._5 < 1.0 && got(src)._5 > 0.0)
    }
  }

  test("q215: Wilson bounds equal the scalar formula and bracket the rate") {
    val got = graft.queries.Catalog.all("q215_wilson_interval")
      .build(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.size == 2, s"both variants must report: $got")
    got.foreach { case (v, (n, c, p, lo, hi)) =>
      val nd = n.toDouble; val pd = c.toDouble / nd; val z = 1.96
      val denom = 1.0 + z * z / nd
      val center = pd + z * z / (2.0 * nd)
      val half = z * math.sqrt(pd * (1.0 - pd) / nd + z * z / (4.0 * nd * nd))
      assert(p == pd, s"variant $v rate")
      assert(math.abs(lo - (center - half) / denom) < 1e-12, s"variant $v lo")
      assert(math.abs(hi - (center + half) / denom) < 1e-12, s"variant $v hi")
      // the interval must be informative: inside [0,1], brackets p̂,
      // and non-degenerate on the fixture (0 < p̂ < 1 in both arms)
      assert(lo >= 0.0 && hi <= 1.0 && lo < p && p < hi && c > 0 && c < n,
        s"variant $v interval: ($lo, $p, $hi) c=$c n=$n")
    }
  }

  test("q216: tau-b equals the all-pairs concordance ground truth") {
    val per = Tables(spark, sf(), "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum / 10000L))
      .toMap.values.toArray
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- per.indices; j <- (i + 1) until per.length) {
      val ((x1, y1), (x2, y2)) = (per(i), per(j))
      val sx = java.lang.Long.signum(x2 - x1)
      val sy = java.lang.Long.signum(y2 - y1)
      if (sx == 0 && sy != 0) tx += 1
      else if (sy == 0 && sx != 0) ty += 1
      else if (sx * sy > 0) conc += 1
      else if (sx * sy < 0) disc += 1
    }
    val n = per.length.toLong
    val n0 = n * (n - 1) / 2
    val n1 = per.map(_._1).groupBy(identity).values
      .map(g => g.length.toLong * (g.length - 1) / 2).sum
    val n2 = per.map(_._2).groupBy(identity).values
      .map(g => g.length.toLong * (g.length - 1) / 2).sum
    val expected = (conc - disc).toDouble /
      (math.sqrt((n0 - n1).toDouble) * math.sqrt((n0 - n2).toDouble))

    val row = graft.queries.Catalog.all("q216_kendall_tau")
      .build(spark, sf()).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((n, n0, n1, n2)), s"counts: $row")
    assert(row.getLong(4) == conc && row.getLong(5) == disc,
      s"concordance: got (${row.getLong(4)}, ${row.getLong(5)}), want ($conc, $disc)")
    assert(row.getDouble(6) == expected, s"tau_b")
    // association must exist on the fixture or the entry is vacuous
    assert(row.getDouble(6) > 0.3, s"tau_b too weak: ${row.getDouble(6)}")
  }

  test("q217: every type's lift equals the scalar recount") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val conv = ev.groupBy(_._1).view.mapValues(rows =>
      rows.exists(t => t._2 == "purchase" && t._3 >= 150.0)).toMap
    val nAll = conv.size.toLong
    val cAll = conv.count(_._2).toLong
    val got = graft.queries.Catalog.all("q217_conversion_lift")
      .build(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(4)))).toMap
    val k = graft.queries.Windowed.LiftExposure
    val byType = ev.groupBy(t => (t._2, t._1)).filter(_._2.length >= k)
      .keys.toSeq.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (tp, users) =>
      val n = users.length.toLong
      val c = users.count(u => conv(u._2)).toLong
      val lift = (c * nAll).toDouble / (n * cAll).toDouble
      assert(got(tp) == ((n, c, lift)), s"$tp: got ${got(tp)}, want ($n,$c,$lift)")
    }
    // lift must vary across types on the fixture or the entry orders
    // nothing (the threshold was probed to guarantee this)
    val lifts = got.values.map(_._3)
    assert(lifts.min < lifts.max, s"lift must discriminate: $got")
  }

  test("q209: rho equals plain-midrank Pearson within 1e-12") {
    val per = Tables(spark, sf(), "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum / 10000L))
      .toMap.values.toArray
    def midranks(vs: Array[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val rx = midranks(per.map(_._1))
    val ry = midranks(per.map(_._2))
    val xs = per.map(t => rx(t._1)); val ys = per.map(t => ry(t._2))
    val n = per.length.toDouble
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = xs.map(a => (a - mx) * (a - mx)).sum
    val vy = ys.map(b => (b - my) * (b - my)).sum
    val expected = cov / math.sqrt(vx * vy)

    val row = graft.queries.Catalog.all("q209_spearman")
      .build(spark, sf()).collect().head
    assert(row.getLong(0) == per.length.toLong)
    assert(math.abs(row.getDouble(6) - expected) < 1e-12,
      s"rho: got ${row.getDouble(6)}, want $expected")
    // monotone association must actually exist on the fixture (heavy
    // orderers spend more), or the entry verifies nothing
    assert(row.getDouble(6) > 0.5, s"fixture association too weak: $row")
  }

  test("q237: Brier equals the scalar reference; sources differ (non-degenerate)") {
    val rows = Tables(spark, sf(), "documents")
      .select(col("source"), col("n_chars"), col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val scores = rows.map(_._2)
    val mn = scores.min
    val den = scores.max - mn + 1
    val ref = rows.groupBy(_._1).map { case (src, rs) =>
      val sse = rs.map { case (_, sc, lang) =>
        val r = (sc - mn) - (if (lang == "en") den else 0L)
        r * r
      }.sum
      src -> ((rs.length.toLong, sse,
        sse.toDouble / (rs.length.toDouble * den.toDouble * den.toDouble)))
    }
    val got = graft.queries.Catalog.all("q237_brier_score")
      .build(spark, sf()).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // per-source briers must actually differ or the slice adds nothing
    assert(got.values.map(_._3).toSet.size > 1, "flat brier across sources")
  }

  test("q238: RBO equals the suffix-weight recount over q128's own ranking") {
    // every (lexical top-k) ∩ (fused top-k) member appears in q128's
    // output carrying its lex_rk, so the reference needs only that
    // table — an independent path through the fusion contract
    val fused = graft.queries.Catalog.all("q128_hybrid_rrf")
      .build(spark, sf()).collect()
    val w = graft.queries.TextAnalysis.RboSuffix1920.toMap
    val ref = fused.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.filter(!_.isNullAt(2))
        .map(r => w(math.max(r.getInt(2), r.getInt(5)))).sum
    }
    val got = graft.queries.Catalog.all("q238_fusion_rbo")
      .build(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == ref.keySet, s"query set: ${got.keySet}")
    for ((q, rbo1920) <- ref) {
      assert(got(q)._2 == rbo1920, s"q$q: got ${got(q)._2}, want $rbo1920")
      assert(got(q)._3 == rbo1920.toDouble / 1920.0, s"q$q division")
    }
    // the audit must see a real SHIFT (not identity) and a real
    // OVERLAP (not disjoint lists) somewhere on the fixture
    assert(got.values.exists(_._2 < 1860L), "fusion never moved a ranking")
    assert(got.values.exists(_._2 > 0L), "legs fully disjoint - vacuous")
  }

  test("q241: Murphy decomposition closes its identity and matches a scalar recount") {
    val rows = Tables(spark, sf(), "documents")
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), if (r.getString(1) == "en") 1L else 0L))
    val mn = rows.map(_._1).min
    val den = (rows.map(_._1).max - mn + 1).toDouble
    val n = rows.length.toDouble
    // integer bin exactly as the entry computes it, BEFORE any float
    val ps = rows.map { case (s, y) =>
      ((s - mn) * 10 / den.toLong, (s - mn) / den, y.toDouble) }
    val brier = ps.map { case (_, p, y) => (p - y) * (p - y) }.sum / n
    val yBar = ps.map(_._3).sum / n
    val byBin = ps.groupBy(_._1)
      .map { case (b, v) => b -> v.map(t => (t._2, t._3)) }
    val binStats = byBin.values.map { b =>
      val nb = b.length.toDouble
      val pb = b.map(_._1).sum / nb; val yb = b.map(_._2).sum / nb
      (nb, pb, yb, b)
    }.toSeq
    val rel = binStats.map { case (nb, pb, yb, _) => nb * (pb - yb) * (pb - yb) }.sum / n
    val res = binStats.map { case (nb, _, yb, _) => nb * (yb - yBar) * (yb - yBar) }.sum / n
    val unc = yBar * (1 - yBar)
    val wbv = binStats.map { case (_, pb, _, b) =>
      b.map { case (p, _) => (p - pb) * (p - pb) }.sum }.sum / n
    val cov = binStats.map { case (_, pb, _, b) =>
      b.map { case (p, y) => (p - pb) * y }.sum }.sum / n

    val r = graft.queries.Catalog.all("q241_brier_decomposition")
      .build(spark, sf()).collect().head
    val (gb, grel, gres, gunc, gwbv, gcov) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    // the identity the two extra terms exist to close
    assert(math.abs(gb - (gwbv + grel - gres + gunc - 2 * gcov)) <= 1e-12,
      s"identity gap: $r")
    for ((got, want, nm) <- Seq((gb, brier, "brier"), (grel, rel, "rel"),
        (gres, res, "res"), (gunc, unc, "unc"), (gwbv, wbv, "wbv"),
        (gcov, cov, "cov")))
      assert(math.abs(got - want) <= 1e-9,
        s"$nm: got $got, want $want")
    // all three Murphy components must carry real signal
    assert(grel > 0 && gres > 0 && gunc > 0, s"degenerate components: $r")
  }

  test("q243: gains table equals a scalar recount; capture is monotone to 1.0") {
    val rows = Tables(spark, sf(), "documents")
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), if (r.getString(1) == "en") 1L else 0L))
    val mn = rows.map(_._1).min
    val den = rows.map(_._1).max - mn + 1
    val byBin = rows.groupBy { case (s, _) => (s - mn) * 10 / den }
    val gp = rows.map(_._2).sum.toDouble
    val gRate = gp / rows.length
    val got = graft.queries.Catalog.all("q243_gains_table")
      .build(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet == byBin.keySet, s"bins: ${got.keySet}")
    var cumN = 0L; var cumP = 0L
    for (bin <- got.keys.toSeq.sorted.reverse) {
      val b = byBin(bin)
      cumN += b.length; cumP += b.map(_._2).sum
      val (nB, pB, gotCumN, gotCumP, capture, lift) = got(bin)
      assert((nB, pB, gotCumN, gotCumP) ==
        ((b.length.toLong, b.map(_._2).sum, cumN, cumP)), s"bin $bin")
      assert(capture == cumP / gp, s"bin $bin capture")
      assert(math.abs(lift - (pB.toDouble / nB) / gRate) < 1e-12,
        s"bin $bin lift")
    }
    // best-first capture must END at exactly 1.0 (all positives seen)
    assert(got(got.keys.min)._5 == 1.0, s"final capture: ${got(got.keys.min)}")
    // and the deciles must differ in lift, or the table ranks nothing
    assert(got.values.map(_._6).toSet.size > 1, "flat lift across deciles")
  }

  test("q244: ECE/MCE equal a scalar recount; MCE bounds ECE") {
    val rows = Tables(spark, sf(), "documents")
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), if (r.getString(1) == "en") 1.0 else 0.0))
    val mn = rows.map(_._1).min
    val den = (rows.map(_._1).max - mn + 1).toDouble
    val n = rows.length.toDouble
    val gaps = rows.groupBy { case (s, _) => (s - mn) * 10 / den.toLong }
      .values.map { b =>
        val nb = b.length.toDouble
        // exact integer sums first, then the entry's own IEEE DAG
        val pb = b.map(t => t._1 - mn).sum.toDouble / (nb * den)
        val yb = b.map(_._2).sum / nb
        (nb, math.abs(pb - yb))
      }
    val ece = gaps.map { case (nb, g) => (nb / n) * g }.sum
    val mce = gaps.map(_._2).max
    val r = graft.queries.Catalog.all("q244_calibration_error")
      .build(spark, sf()).collect().head
    assert(math.abs(r.getDouble(2) - ece) <= 1e-12,
      s"ece: got ${r.getDouble(2)}, want $ece")
    assert(math.abs(r.getDouble(3) - mce) <= 1e-12,
      s"mce: got ${r.getDouble(3)}, want $mce")
    // the scalars must carry signal and respect their own bound
    assert(r.getDouble(2) > 0 && r.getDouble(3) >= r.getDouble(2), r.toString)
  }
}
