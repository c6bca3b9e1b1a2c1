package graft

import org.apache.spark.sql.functions._

/** The round-9 analytics pack (q150 TF-IDF keywords, q151 snapshot diff,
  * q152 triangle census, q153 chi-square independence, q154 PMI
  * collocations, q156 gap histogram) against independent driver-side
  * reference recomputations from the raw fixture — the same
  * small-scale-only cross-check pattern as GraphOpsSpec/ContainmentSpec.
  * Planted-graph/planted-snapshot tests pin the factored kernels'
  * semantics where the fixture can't (a square has zero triangles; all
  * four diff statuses).
  */
class AnalyticsPackSpec extends SparkSuite {

  private def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong

  private lazy val docs: Seq[(Long, String)] =
    Tables(spark, sf(), "documents").select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("q150 keywords match a sequential tf-idf reference") {
    val tf = docs.flatMap { case (id, t) => t.split(" ", -1).map(w => (id, w)) }
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val n = docs.size.toLong
    val expected = tf.toSeq
      .map { case ((id, w), f) => (id, w, f, df(w), f * bits(n / df(w))) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy { case (_, w, _, _, sc) => (-sc, w) }
          .take(graft.queries.TextAnalysis.TfidfTopK).zipWithIndex
          .map { case ((id, w, f, d, sc), i) => (id, i + 1, w, f, d, sc) }
      }.toSet
    val got = graft.queries.Catalog.all("q150_tfidf_keywords").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
    assert(got.nonEmpty && got.size == docs.size * graft.queries.TextAnalysis.TfidfTopK,
      "every fixture doc has >= TfidfTopK distinct terms")
  }

  test("q154 collocations match a sequential PMI-lift reference") {
    val toks = docs.map(_._2.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, vs) => w -> vs.size.toLong }
    val nTok = uni.values.sum
    val big = toks.filter(_.size >= 2)
      .flatMap(ws => ws.zip(ws.tail))
      .groupBy(identity).map { case (p, vs) => p -> vs.size.toLong }
      .filter(_._2 >= graft.queries.TextAnalysis.PmiMinPair)
    val scored = big.toSeq.map { case ((a, b), nab) =>
      (a, b, nab, uni(a), uni(b),
        (nab.toDouble * nTok.toDouble) / (uni(a).toDouble * uni(b).toDouble))
    }
    val expected = scored.sortBy { case (a, b, _, _, _, l) => (-l, a, b) }
      .take(graft.queries.TextAnalysis.PmiTopK).toSet
    val got = graft.queries.Catalog.all("q154_pmi_collocations").build(spark, sf())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
    assert(got.nonEmpty, "fixture must yield >= 1 collocation at the support floor")
  }

  test("q153 cells match a sequential chi-square reference; total is the rounded-cell sum") {
    val meta = Tables(spark, sf(), "documents").select(col("source"), col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cells = meta.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val rt = meta.groupBy(_._1).map { case (s, vs) => s -> vs.size.toLong }
    val ct = meta.groupBy(_._2).map { case (l, vs) => l -> vs.size.toLong }
    val grand = meta.size.toLong
    val refCells = cells.map { case ((s, l), n) =>
      val e = (rt(s).toDouble * ct(l).toDouble) / grand.toDouble
      val c = ((n.toDouble - e) * (n.toDouble - e)) / e
      (s, l, n, math.rint(e * 1e4) / 1e4, math.rint(c * 1e4) / 1e4)
    }.toSet
    val refTotal = BigDecimal(refCells.toSeq.map(r =>
      BigDecimal(r._5).setScale(4)).sum.toString).toDouble
    val got = graft.queries.Catalog.all("q153_chisq_independence").build(spark, sf())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet == refCells,
      "cell rows differ from the sequential reference")
    got.foreach(r => assert(math.abs(r._6 - refTotal) < 1e-9,
      s"chi2_total ${r._6} vs reference $refTotal"))
  }

  test("q156 buckets match a sequential gap reference") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._2)
      s.zip(s.tail).map { case (a, b) => b - a }
    }.toSeq
    val ref = gaps.groupBy(g => bits(g + 1).toInt).map { case (b, gs) =>
      b -> ((gs.size.toLong, gs.min, gs.max))
    }
    val got = graft.queries.Catalog.all("q156_gap_histogram").build(spark, sf())
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSet == ref.keySet, "bucket sets differ")
    got.foreach { case (b, n, mn, mx, share) =>
      val (rn, rmn, rmx) = ref(b)
      assert(n == rn && mn == rmn && mx == rmx, s"bucket $b: ($n,$mn,$mx) vs $ref")
      assert(math.abs(share - rn.toDouble / gaps.size.toDouble) < 1e-12)
    }
  }

  test("q157 skew stats match a sequential frequency-distribution reference") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def ref(key: String, counts: Seq[Long]): (String, Long, Long, Long, Double, Int, Double) = {
      val k = counts.size.toLong
      val r = counts.sum
      val mx = counts.max
      val hist = counts.groupBy(c => bits(c).toInt)
        .map { case (b, cs) => b -> cs.size.toLong }
      val cums = hist.toSeq.sortBy(_._1)
        .scanLeft((0, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }.tail
      val p99 = cums.find { case (_, cum) => cum * 100 >= k * 99 }.get._1
      val mean = r.toDouble / k.toDouble
      (key, k, r, mx, mean, p99, mx.toDouble / mean)
    }
    val expected = Set(
      ref("user_id", ev.groupBy(_._1).values.map(_.size.toLong).toSeq),
      ref("event_type", ev.groupBy(_._2).values.map(_.size.toLong).toSeq))
    val got = graft.queries.Catalog.all("q157_key_skew").build(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5), r.getDouble(6))).toSet
    assert(got == expected, s"got $got\nref $expected")
  }

  test("q158 paths match a sequential 3-step walk; event_type skew dwarfs user_id skew") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).values.flatMap { es =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._4)
      ts.sliding(3).filter(_.size == 3).map(_.mkString(" > "))
    }.toSeq
    val expected = paths.groupBy(identity).map { case (p, vs) => (p, vs.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }
      .take(graft.queries.Windowed.PathTopK).toSet
    val got = graft.queries.Catalog.all("q158_event_paths").build(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected, s"got $got\nref $expected")
    // cross-op sanity: the few-valued event_type key must report higher
    // skew pressure than the many-valued user_id key on this fixture
    val skews = graft.queries.Catalog.all("q157_key_skew").build(spark, sf())
      .collect().map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(skews("event_type") >= 1.0 && skews("user_id") >= 1.0)
  }

  test("q159 accuracy matches a sequential fit-and-walk reference") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._4)
      ts.zip(ts.tail)
    }.toSeq
    val pred = pairs.groupBy(_._1).map { case (p, vs) =>
      val byNext = vs.groupBy(_._2).map { case (n, xs) => n -> xs.size.toLong }
      p -> byNext.toSeq.sortBy { case (n, c) => (-c, n) }.head._1
    }
    val expected = pairs.groupBy(_._1).map { case (p, vs) =>
      val nc = vs.count(_._2 == pred(p)).toLong
      (p, pred(p), vs.size.toLong, nc, nc.toDouble / vs.size.toDouble)
    }.toSet
    val got = graft.queries.Catalog.all("q159_transition_accuracy").build(spark, sf())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == expected, s"got $got\nref $expected")
  }

  test("q160 variant stats and z match a sequential two-proportion reference") {
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val thr = graft.queries.Windowed.AbConvValue
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val users = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      (hash60(u.toString) % graft.queries.Windowed.AbVariants,
        if (es.exists(e => e._2 == "purchase" && e._3 >= thr)) 1L else 0L)
    }
    val byV = users.groupBy(_._1).map { case (v, us) =>
      v -> ((us.size.toLong, us.map(_._2).sum))
    }
    val (n0, c0) = byV.getOrElse(0L, (0L, 0L))
    val (n1, c1) = byV.getOrElse(1L, (0L, 0L))
    val refZ =
      if (n0 == 0 || n1 == 0 || c0 + c1 == 0 || c0 + c1 == n0 + n1) 0.0
      else (c1.toDouble / n1.toDouble - c0.toDouble / n0.toDouble) /
        math.sqrt((c0 + c1).toDouble / (n0 + n1).toDouble *
          (1.0 - (c0 + c1).toDouble / (n0 + n1).toDouble) *
          (1.0 / n0.toDouble + 1.0 / n1.toDouble))
    val got = graft.queries.Catalog.all("q160_ab_test").build(spark, sf())
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == byV.keySet.map(identity))
    byV.foreach { case (v, (n, c)) =>
      val (gn, gc, rate, z) = got(v)
      assert(gn == n && gc == c, s"variant $v: ($gn,$gc) vs ($n,$c)")
      assert(math.abs(rate - c.toDouble / n.toDouble) < 1e-15)
      assert(math.abs(z - refZ) < 1e-12, s"z $z vs $refZ")
    }
    assert(byV.size == 2 && c0 > 0 && c0 < n0,
      "fixture must split users and conversions across both variants")
  }

  test("q161 matches a sequential trailing-window reference; planted spike and dead day page") {
    import spark.implicits._
    // fixture reference: gap-filled daily counts, z over the trailing 7
    val days = Tables(spark, sf(), "events")
      .select(expr("CAST(ts AS DATE)").as("day")).collect()
      .map(_.getDate(0).toLocalDate)
    val byDay = days.groupBy(identity).map { case (d, vs) => d -> vs.size.toLong }
    val (d0, d1) = (days.min, days.max)
    val series = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => d -> byDay.getOrElse(d, 0L)).toSeq
    val win = graft.queries.Windowed.AnomWin
    val expected = series.indices.drop(win).map { i =>
      val w = series.slice(i - win, i).map(_._2)
      val (s, ss) = (w.sum, w.map(x => x * x).sum)
      val mean = s.toDouble / win.toDouble
      val std = math.sqrt((win * ss - s * s).toDouble / (win * win).toDouble)
      val x = series(i)._2
      val z = if (std == 0.0) 0.0 else (x.toDouble - mean) / std
      (series(i)._1.toString, x, mean, std, z, math.abs(z) >= graft.queries.Windowed.AnomZ)
    }.toSet
    val got = graft.queries.Catalog.all("q161_daily_anomaly").build(spark, sf())
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(2)} ref-only=${(expected -- got).take(2)}")

    // planted: 8 steady days (alternating 10/12 so std > 0), a DEAD
    // day 9 (spine-filled zero), a normal day 10, then a 40-event
    // spike day 11. Dead day precedes the spike on purpose: a spike
    // inside the trailing window inflates std and masks later
    // anomalies — trailing-z's known baseline-poisoning property, not
    // a bug, so the plant keeps each anomaly's window clean.
    val dir = tmpDir("anom").toString
    def t(d: Int, i: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 08:${i % 60}%02d:00")
    val steady = (1 to 8).flatMap(d =>
      (0 until (if (d % 2 == 0) 12 else 10)).map(i =>
        ((d * 100 + i).toLong, t(d, i), 7L, "view", 1.0, "{}")))
    val day10 = (0 until 10).map(i => ((800 + i).toLong, t(10, i), 7L, "view", 1.0, "{}"))
    val spike = (0 until 40).map(i => ((900 + i).toLong, t(11, i), 7L, "view", 1.0, "{}"))
    (steady ++ day10 ++ spike)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val p = graft.queries.Catalog.all("q161_daily_anomaly").build(spark, dir)
      .collect().map(r => r.getDate(0).toString -> ((r.getDouble(4), r.getBoolean(5)))).toMap
    assert(p("2024-03-09")._2 && p("2024-03-09")._1 < 0,
      s"dead day must page: ${p("2024-03-09")}")
    assert(p("2024-03-11")._2 && p("2024-03-11")._1 > 0,
      s"spike day must page: ${p("2024-03-11")}")
    assert(!p("2024-03-08")._2, s"steady day must not page: ${p("2024-03-08")}")
  }

  test("q162 DAU/WAU match a sequential rolling-distinct reference") {
    val ev = Tables(spark, sf(), "events")
      .select(expr("CAST(ts AS DATE)").as("day"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1))).distinct
    val days = ev.map(_._1).distinct
    val expected = days.map { d =>
      val dau = ev.count(_._1 == d).toLong
      val wau = ev.filter(e => !e._1.isAfter(d) && !e._1.isBefore(d.minusDays(6)))
        .map(_._2).distinct.size.toLong
      (d.toString, dau, wau, dau.toDouble / wau.toDouble)
    }.toSet
    val got = graft.queries.Catalog.all("q162_active_users").build(spark, sf())
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(2)} ref-only=${(expected -- got).take(2)}")
    // stickiness is a ratio of distinct-user counts: bounded (0, 1]
    got.foreach { case (d, dau, wau, st) =>
      assert(dau >= 1 && wau >= dau && st > 0.0 && st <= 1.0, s"$d: $dau/$wau/$st")
    }
  }

  test("q164 duration buckets match a sequential sessionization reference") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val gap = 6L * 3600 * 1000000
    // per user: sort by (ts, event_id), split at gap >= 6h, duration =
    // last - first per session (q32's boundary semantics)
    val durs = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, t) =>
        if (t - acc.head.head >= gap) List(t) :: acc
        else (t :: acc.head) :: acc.tail
      }
      sessions.map(s => (s.head - s.last, s.size.toLong)) // desc-built: head=last
    }.toSeq
    val expected = durs.groupBy { case (d, _) => bits(d + 1) }
      .map { case (b, xs) =>
        (b.toInt, xs.size.toLong, xs.map(_._2).sum,
          xs.map(_._1).min, xs.map(_._1).max,
          xs.size.toDouble / durs.size.toDouble)
      }.toSet
    val got = graft.queries.Catalog.all("q164_session_duration").build(spark, sf())
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(2)} ref-only=${(expected -- got).take(2)}")
  }

  test("q165 matches a sequential fixed-point personalized-PageRank replay") {
    val fp = graft.queries.Similarity.FixedPointScale
    val seeds = (0L until graft.queries.Similarity.PprSeeds).toSet
    val edges = graft.queries.Catalog.all("q134_knn_graph").build(spark, sf())
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val verts = Tables(spark, sf(), "embeddings").select(col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val base = (15L * (fp / seeds.size)) / 100L
    var r: Map[Long, Long] =
      verts.map(v => v -> (if (seeds(v)) fp / seeds.size else 0L)).toMap
    (1 to graft.queries.Similarity.PageRankIters).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = verts.map(v => v ->
        ((if (seeds(v)) base else 0L) + (85L * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    val got = graft.queries.Catalog.all("q165_personalized_pagerank")
      .build(spark, sf())
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == r, s"first diffs: ${
      (got.toSet -- r.toSet).take(3)} vs ${(r.toSet -- got.toSet).take(3)}")
    // proximity semantics: teleport mass never leaves the seed
    // neighborhood — off-seed vertices with no inbound edges rank 0
    val inbound = edges.map(_._2).toSet
    verts.filterNot(seeds).filterNot(inbound)
      .foreach(v => assert(got(v) == 0L, s"unreachable $v ranked ${got(v)}"))
    assert(seeds.forall(s => got(s) >= base), "seed below its teleport base")
  }

  test("q166 matches a sequential sorted-rank Gini reference") {
    val ut = Tables(spark, sf(), "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      .groupBy(identity).map { case ((u, t), xs) => (u, t, xs.size.toLong) }.toSeq
    val groups = ut.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3) } +
      ("__all__" -> ut.groupBy(_._1).map(_._2.map(_._3).sum).toSeq)
    val expected = groups.map { case (t, xs) =>
      val sorted = xs.sorted
      val n = sorted.size.toLong
      val tt = sorted.sum
      val s = sorted.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
      // the SAME IEEE tree as the query (and its oracle): exact integer
      // inputs, identical op order -> bit-identical doubles
      (t, n, tt,
        2.0 * s.toDouble / (n.toDouble * tt.toDouble) -
          (n.toDouble + 1.0) / n.toDouble)
    }.toSet
    val got = graft.queries.Catalog.all("q166_activity_gini").build(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(2)} ref-only=${(expected -- got).take(2)}")
    got.foreach { case (t, _, _, g) =>
      assert(g >= 0.0 && g < 1.0, s"gini($t) = $g out of range") }
  }

  test("q167 matches a sequential Tukey-fence reference and flags the fixture tail") {
    val ud = Tables(spark, sf(), "events")
      .select(col("user_id"), expr("CAST(ts AS DATE)").as("day")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString)).toSeq
      .groupBy(identity).map { case ((u, d), xs) => (u, d, xs.size.toLong) }.toSeq
    val sorted = ud.map(_._3).sorted
    val n = sorted.size.toLong
    def rank(r: Long) = sorted((r - 1).toInt) // type-1: value at 1-indexed rank
    val q1 = rank((n + 3) / 4)
    val q3 = rank((3 * n + 3) / 4)
    val expected = ud.filter { case (_, _, c) =>
      2 * c < 2 * q1 - 3 * (q3 - q1) || 2 * c > 2 * q3 + 3 * (q3 - q1)
    }.map { case (u, d, c) =>
      (u, d, c, q1, q3,
        if (2 * c > 2 * q3 + 3 * (q3 - q1)) "high" else "low")
    }.toSet
    val got = graft.queries.Catalog.all("q167_activity_outliers").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(2)} ref-only=${(expected -- got).take(2)}")
    assert(got.nonEmpty, "fixture must flag at least one burst user-day")
  }

  test("snapshotDiff classifies all four statuses on a planted pair") {
    import spark.implicits._
    val old = Seq((1L, "ha"), (2L, "hb"), (3L, "hc"))
      .toDF("doc_id", "old_digest")
    val neu = Seq((2L, "hb"), (3L, "hx"), (4L, "hd"))
      .toDF("doc_id", "new_digest")
    val got = graft.queries.Pipeline.snapshotDiff(old, neu)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
  }

  test("triangleStats: planted triangle scores 1.0, planted square 0.0") {
    import spark.implicits._
    // triangle {1,2,3} + square {10,11,12,13} (no chord) + pendant 20-21
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L),
      (20L, 21L)).toDF("a", "b")
    val got = graft.queries.Similarity.triangleStats(und)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    Seq(1L, 2L, 3L).foreach(v => assert(got(v) == ((2L, 1L, 1.0)), s"triangle $v: ${got(v)}"))
    Seq(10L, 11L, 12L, 13L).foreach(v => assert(got(v) == ((2L, 0L, 0.0)), s"square $v: ${got(v)}"))
    Seq(20L, 21L).foreach(v => assert(got(v) == ((1L, 0L, 0.0)), s"pendant $v: ${got(v)}"))
  }

  test("q152 triangle census matches a sequential count over the q134 edges") {
    val und = graft.queries.Catalog.all("q134_knn_graph").build(spark, sf())
      .filter(col("q_id") =!= col("n_id"))
      .select(least(col("q_id"), col("n_id")), greatest(col("q_id"), col("n_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = und.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val nTri = adj.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2).count(p => und((math.min(p(0), p(1)), math.max(p(0), p(1)))))
    }
    val got = graft.queries.Catalog.all("q152_graph_triangles").build(spark, sf())
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == adj.keySet, "vertex sets differ")
    adj.foreach { case (v, ns) =>
      val (deg, t, cc) = got(v)
      assert(deg == ns.size.toLong, s"deg($v): $deg vs ${ns.size}")
      assert(t == nTri(v).toLong, s"n_tri($v): $t vs ${nTri(v)}")
      val expCc = if (ns.size < 2) 0.0
        else (2.0 * nTri(v)) / (ns.size.toDouble * (ns.size - 1))
      assert(math.abs(cc - expCc) < 1e-12, s"cc($v): $cc vs $expCc")
    }
    assert(nTri.values.sum > 0, "fixture kNN graph must contain >= 1 triangle")
  }

  test("q168 attribution matches a sequential last-touch walk") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    val win = graft.queries.Windowed.AttrWindowUs
    val touch = graft.queries.Windowed.AttrTouch.toSet
    val attributed = ev.groupBy(_._1).values.flatMap { rows =>
      var last: Option[(String, Long)] = None
      rows.sortBy(r => (r._2, r._3)).flatMap { case (_, us, _, ty, v) =>
        val out =
          if (ty == "purchase")
            Some((last.filter(us - _._2 <= win).map(_._1).getOrElse("none"), v))
          else None
        if (touch(ty)) last = Some((ty, us))
        out
      }
    }.toSeq
    val expected = attributed.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.size.toLong, xs.map(_._2).sum,
        xs.size.toDouble / attributed.size.toDouble))
    }
    val got = graft.queries.Catalog.all("q168_conversion_attribution")
      .build(spark, sf())
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet, s"${got.keySet} vs ${expected.keySet}")
    expected.foreach { case (t, (n, rev, share)) =>
      val (gn, grev, gshare) = got(t)
      assert(gn == n, s"n($t): $gn vs $n")
      // engine revenue is round(sum, 4) over a different fold order —
      // one rounding grain of tolerance absorbs the pre-round ulps
      assert(math.abs(grev - rev) < 1e-3, s"revenue($t): $grev vs $rev")
      assert(math.abs(gshare - share) < 1e-12, s"share($t): $gshare vs $share")
    }
    assert(expected.keySet == Set("click", "view", "none"),
      "fixture must exercise all three attribution arms")
  }

  test("q171 linear attribution matches a sequential multi-touch walk and conserves value") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    val win = graft.queries.Windowed.AttrWindowUs
    val touch = graft.queries.Windowed.AttrTouch.toSet
    var noneN = 0L; var noneRev = 0.0
    val cred = scala.collection.mutable.Map.empty[String, (Long, Double)]
    var totalPurchased = 0.0
    ev.groupBy(_._1).values.foreach { rows =>
      val touches = rows.filter(r => touch(r._4))
      rows.filter(_._4 == "purchase").foreach { p =>
        totalPurchased += p._5
        val inWin = touches.filter(t =>
          (t._2 < p._2 || (t._2 == p._2 && t._3 < p._3)) && p._2 - t._2 <= win)
        if (inWin.isEmpty) { noneN += 1; noneRev += p._5 }
        else inWin.foreach { t =>
          val c = cred.getOrElse(t._4, (0L, 0.0))
          cred(t._4) = (c._1 + 1, c._2 + p._5 / inWin.size)
        }
      }
    }
    val expected = (cred.toMap + ("none" -> ((noneN, noneRev))))
    val got = graft.queries.Catalog.all("q171_linear_attribution").build(spark, sf())
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet, s"${got.keySet} vs ${expected.keySet}")
    expected.foreach { case (t, (n, rev)) =>
      assert(got(t)._1 == n, s"n_credits($t): ${got(t)._1} vs $n")
      assert(math.abs(got(t)._2 - rev) < 1e-3, s"revenue($t): ${got(t)._2} vs $rev")
    }
    // equal-split credit must conserve total purchase value exactly
    val conserved = cred.values.map(_._2).sum + noneRev
    assert(math.abs(conserved - totalPurchased) < 1e-6,
      s"credit leaked: $conserved vs $totalPurchased")
    assert(expected.keySet == Set("click", "view", "none"),
      "fixture must exercise both credited arms and the none arm")
  }

  test("q172 split is group-integral and matches a sequential recount") {
    val rows = Tables(spark, sf(), "documents")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    def frac(src: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    def splitOf(src: String): String = {
      val f = frac(src)
      if (f < graft.queries.Pipeline.GroupTrainFrac) "train"
      else if (f < graft.queries.Pipeline.GroupValCut) "val" else "test"
    }
    val bySplit = rows.groupBy(r => splitOf(r._1))
    val expected = bySplit.map { case (sp, rs) =>
      sp -> ((rs.map(_._1).distinct.size.toLong, rs.size.toLong,
        rs.map(_._2.split(" ", -1).length.toLong).sum, rs.map(_._1).min))
    }
    val got = graft.queries.Catalog.all("q172_group_split").build(spark, sf())
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got == expected, s"$got vs $expected")
    // group integrity: every source lands in exactly ONE split
    val sourceSplits = rows.map(_._1).distinct
      .groupBy(splitOf).values.map(_.toSet).toSeq
    assert(sourceSplits.combinations(2).forall(p => (p(0) & p(1)).isEmpty),
      "a source straddles two splits")
    assert(expected.keySet == Set("train", "val", "test"),
      "all three splits must be non-empty at every SF (source names are SF-invariant)")
  }

  test("q173 cross-split leakage matches a recount over the q41 pairs") {
    val asg = Tables(spark, sf(), "documents").select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    def frac(src: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16).toDouble / 4294967296.0
    }
    def splitOf(d: Long): String = {
      val f = frac(asg(d))
      if (f < graft.queries.Pipeline.GroupTrainFrac) "train"
      else if (f < graft.queries.Pipeline.GroupValCut) "val" else "test"
    }
    val pairs = graft.queries.Catalog.all("q41_dedup_minhash").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val crossing = pairs.map { case (a, b, j) => (splitOf(a), splitOf(b), a, j) }
      .filter(p => p._1 != p._2)
      .map { case (s1, s2, a, j) =>
        (if (s1 < s2) s1 else s2, if (s1 < s2) s2 else s1, a, j) }
    val expected = crossing.groupBy(p => (p._1, p._2)).map { case (k, xs) =>
      k -> ((xs.size.toLong, xs.map(_._4).max, xs.map(_._3).min))
    }
    val got = graft.queries.Catalog.all("q173_split_leakage").build(spark, sf())
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got == expected, s"$got vs $expected")
    assert(expected.nonEmpty, "fixture must contain cross-split near-dup pairs")
  }

  test("q174 EWMA matches a sequential fixed-point fold; negative residuals floor") {
    val days = Tables(spark, sf(), "events")
      .select(expr("CAST(ts AS DATE)").as("day"))
      .collect().map(_.getDate(0).toString).groupBy(identity)
      .map { case (d, xs) => d -> xs.size.toLong }.toSeq.sortBy(_._1)
    var prev = -1L
    val expected = days.map { case (d, n) =>
      val nfp = n << 20
      val (e, r) = if (prev == -1L) (nfp, 0L) else (prev + ((nfp - prev) >> 2), nfp - prev)
      prev = e
      (d, n, e, r)
    }.toSet
    val got = graft.queries.Catalog.all("q174_ewma_baseline").build(spark, sf())
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(2)} ref-only=${(expected -- got).take(2)}")
    assert(expected.exists(_._4 < 0),
      "fixture must exercise the negative-residual arithmetic-shift branch")
  }

  test("q169 lag buckets match a sequential funnel-latency reference") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val su = ev.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._2).min }
    val lats = ev.filter(_._3 == "purchase")
      .flatMap { case (u, us, _) => su.get(u).filter(_ <= us).map(s => (u, us, s)) }
      .groupBy(_._1).values
      .map(rs => rs.map(_._2).min - rs.head._3).toSeq
    val expected = lats.groupBy(l => bits(l + 1)).map { case (b, xs) =>
      (b.toInt, xs.size.toLong, xs.min, xs.max,
        xs.size.toDouble / lats.size.toDouble)
    }.toSet
    val got = graft.queries.Catalog.all("q169_conversion_lag").build(spark, sf())
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(2)} ref-only=${(expected -- got).take(2)}")
    assert(expected.size >= 4, "fixture spreads latencies across >= 4 log2 buckets")
  }

  test("q170 rank brackets are exact order statistics and the sketch sits inside") {
    val rows = Tables(spark, sf(), "orders")
      .select(col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val expected = rows.groupBy(_._1).map { case (st, rs) =>
      val cents = rs.map(r => math.round(r._2 * 100)).sorted
      val n = cents.size.toLong
      val eps = (n * 2 + 99) / 100
      def at(rank: Long) = cents((rank - 1).toInt)
      st -> ((n, at((n + 1) / 2), at(math.max(1L, n / 2 - eps)),
        at(math.min(n, (n + 1) / 2 + eps))))
    }
    val got = graft.queries.Catalog.all("q170_quantile_sketch").build(spark, sf())
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(got.keySet == expected.keySet, s"${got.keySet} vs ${expected.keySet}")
    expected.foreach { case (st, (n, med, lo, hi)) =>
      val (gn, gmed, glo, ghi, within) = got(st)
      assert(gn == n, s"n($st): $gn vs $n")
      assert(gmed == med, s"med($st): $gmed vs $med")
      assert(glo == lo && ghi == hi, s"bracket($st): ($glo,$ghi) vs ($lo,$hi)")
      assert(within, s"sketch answer for $st escaped its ±2%-rank bracket")
      assert(lo <= med && med <= hi, s"bracket($st) must contain the median")
    }
  }

  test("q177 profile matches exact per-column recounts; HLL stays in band") {
    val cols = graft.queries.Relational.ProfileCols
    val rows = Tables(spark, sf(), "lineitem")
      .select(cols.map(col): _*).collect()
    val expected = cols.zipWithIndex.map { case (c, i) =>
      val vs = rows.map(_.get(i))
      c -> ((rows.length.toLong, vs.count(_ == null).toLong,
        vs.filter(_ != null).distinct.length.toLong))
    }.toMap
    val got = graft.queries.Catalog.all("q177_column_profile")
      .build(spark, sf()).collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (c, (n, nulls, ndv)) =>
      val (gn, gnulls, gndv, ok) = got(c)
      assert((gn, gnulls, gndv) == ((n, nulls, ndv)), s"column $c")
      assert(ok, s"column $c: HLL estimate escaped its 15% band")
    }
  }

  test("q179 intervals match a sequential run-length reference") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val expected = ev.groupBy(_._1).flatMap { case (u, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._4))
      // run starts: index, state, first-us
      val starts = sorted.zipWithIndex.filter { case (r, i) =>
        i == 0 || sorted(i - 1)._2 != r._2 }
      starts.zipWithIndex.map { case ((r, i), si) =>
        val next = if (si + 1 < starts.size) Some(starts(si + 1)) else None
        (u, r._2, r._3, next.map(_._1._3),
          next.map(_._2.toLong).getOrElse(sorted.size.toLong) - i,
          next.isEmpty)
      }
    }.toSet
    val got = graft.queries.Catalog.all("q179_scd2_intervals")
      .build(spark, sf()).collect().map { r =>
        (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4), r.getBoolean(5))
      }.toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
    assert(expected.exists(_._6) && expected.exists(!_._6),
      "fixture must exercise both closed and current intervals")
  }

  test("q181 CDC compaction matches a sequential latest-wins apply") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    val expected = ev.groupBy(_._1).flatMap { case (u, rs) =>
      val last = rs.maxBy(r => (r._2, r._3))
      if (last._4 == "error") None
      else Some((u, last._4, last._5, last._2, rs.size.toLong))
    }.toSet
    val got = graft.queries.Catalog.all("q181_cdc_compact")
      .build(spark, sf()).collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
    val users = ev.map(_._1).distinct.size
    assert(expected.size < users, "the delete arm must drop at least one key")
  }

  test("q182 boundaries are exact order statistics; GK sits in every bracket") {
    val cents = Tables(spark, sf(), "lineitem").select(col("l_extendedprice"))
      .collect().map(r => math.round(r.getDouble(0) * 100)).sorted
    val n = cents.length.toLong
    val b = graft.queries.Relational.HistB.toLong
    val eps = (n * 2 + 99) / 100
    def at(rank: Long) = cents((rank - 1).toInt)
    val expected = (1L until b).map { k =>
      val rk = (k * n + b - 1) / b
      (k.toInt, n, rk, at(rk), at(math.max(1L, rk - eps)),
        at(math.min(n, rk + eps)))
    }.toSet
    val got = graft.queries.Catalog.all("q182_equidepth_hist")
      .build(spark, sf()).collect().map { r =>
        assert(r.getBoolean(6), s"GK escaped its bracket at k=${r.getInt(0)}")
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      }.toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
  }

  test("q184 CUSUM matches a sequential two-sided fold and pages both ways") {
    val days = Tables(spark, sf(), "events")
      .select(expr("CAST(ts AS DATE)"), col("event_id"))
      .collect().map(r => r.getDate(0).toString)
      .groupBy(identity).map { case (d, vs) => d -> vs.size.toLong }
      .toSeq.sortBy(_._1)
    val dCnt = days.size.toLong
    val tot = days.map(_._2).sum
    val slack = tot / graft.queries.Windowed.CusumSlackDenom
    val h = tot / graft.queries.Windowed.CusumHDenom
    var (su, sd) = (0L, 0L)
    val expected = days.map { case (d, n) =>
      val term = n * dCnt - tot
      su = math.max(0L, su + term - slack)
      sd = math.max(0L, sd - term - slack)
      (d, n, su, sd, su > h, sd > h)
    }.toSet
    val got = graft.queries.Catalog.all("q184_cusum_changepoint")
      .build(spark, sf()).collect().map(r => (r.getDate(0).toString,
        r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
        r.getBoolean(5))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
    assert(expected.exists(_._5) && expected.exists(_._6),
      "both CUSUM directions must page on the fixture")
    assert(expected.exists(r => !r._5 || !r._6),
      "some fixture days must stay unflagged")
  }

  test("q185 merged partial stats equal direct whole-corpus stats") {
    val rows = Tables(spark, sf(), "documents")
      .select(col("source"), col("text"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val expected = rows.groupBy(_._1).map { case (src, rs) =>
      val n = rs.size.toLong
      val tok = rs.map(_._2.split(" ", -1).length.toLong).sum
      val cs = rs.map(_._3).sum
      val css = rs.map(r => r._3 * r._3).sum
      (src, n, tok, cs, css, rs.map(_._3).max, cs.toDouble / n.toDouble)
    }.toSet
    val got = graft.queries.Catalog.all("q185_incremental_stats")
      .build(spark, sf()).collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getDouble(6))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
  }

  test("q186 co-visitation matches a sequential session-set reference") {
    val kOf = """\d+""".r
    val sess = Tables(spark, sf(), "events")
      .select(col("user_id"), expr("CAST(ts AS DATE)"), col("props"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        kOf.findFirstIn(r.getString(2)).get.toInt)).distinct
    val expected = sess.groupBy(r => (r._1, r._2)).toSeq
      .flatMap { case (_, rs) =>
        val items = rs.map(_._3).distinct.sorted
        for (i <- items.indices; j <- (i + 1) until items.size)
          yield (items(i), items(j))
      }
      .groupBy(identity).map { case (p, vs) => (p._1, p._2, vs.size.toLong) }
      .filter(_._3 >= graft.queries.Windowed.CovisMinSessions).toSet
    val got = graft.queries.Catalog.all("q186_covisitation")
      .build(spark, sf()).collect().map(r => (r.getInt(0), r.getInt(1),
        r.getLong(2))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
    assert(got.nonEmpty, "the coincidence floor must leave surviving pairs")
  }

  test("q187 true join sizes match materialized joins; estimates exact") {
    def keyCounts(t: String, k: String): Map[Long, Long] =
      Tables(spark, sf(), t).select(col(k)).collect()
        .map(_.getLong(0)).groupBy(identity)
        .map { case (key, vs) => key -> vs.size.toLong }
    val audits = Seq(
      ("custkey", keyCounts("orders", "o_custkey"),
        keyCounts("customer", "c_custkey")),
      ("orderkey", keyCounts("lineitem", "l_orderkey"),
        keyCounts("orders", "o_orderkey")))
    val expected = audits.map { case (tag, a, b) =>
      val nA = a.values.sum; val nB = b.values.sum
      val est = nA * nB / math.max(a.size.toLong, b.size.toLong)
      val actual = a.keysIterator
        .map(k => a(k) * b.getOrElse(k, 0L)).sum
      (tag, nA, nB, a.size.toLong, b.size.toLong, est, actual,
        actual.toDouble / est.toDouble)
    }.toSet
    val got = graft.queries.Catalog.all("q187_join_cardinality")
      .build(spark, sf()).collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(2)} ref-only=${(expected -- got).take(2)}")
    // the true size must equal an actually-materialized join's count
    val join1 = Tables(spark, sf(), "orders").join(
      Tables(spark, sf(), "customer"),
      col("o_custkey") === col("c_custkey")).count()
    assert(expected.find(_._1 == "custkey").get._7 == join1,
      "sum-of-products must equal the materialized join count")
  }

  test("q180 diversity matches sequential token tallies") {
    val expected = docs.map { case (id, t) =>
      val counts = t.split(" ", -1).groupBy(identity)
        .map { case (_, vs) => vs.length.toLong }
      val n = counts.sum
      val ss = counts.map(c => c * c).sum
      (id, n, counts.size.toLong, ss,
        (n * n - ss).toDouble / (n * n).toDouble)
    }.toSet
    val got = graft.queries.Catalog.all("q180_token_diversity")
      .build(spark, sf()).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got == expected,
      s"spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
    // the signal must separate docs: not all fixture indices identical
    assert(expected.map(_._5).size > 1)
  }

  test("q227 sketch WAU survives a calendar gap (RANGE frame, not ROWS)") {
    import spark.implicits._
    // planted activity with day 3..4 missing: a ROWS 6-PRECEDING frame
    // would union the last 7 PRESENT days across the gap (over-count);
    // the calendar RANGE frame must union exactly [d-6, d]. Users are
    // disjoint per day so exact WAU is the sum of present-day counts
    // in the calendar window — small enough that HLL at lgK 14 is
    // exact, making hll_ok a sharp assertion, not a band.
    val dir = tmpDir("q227_gap").toString
    val days = Seq(0, 1, 2, 5, 6, 7, 8, 9, 10, 11, 12)
    val rows = for {
      d0 <- days
      u <- 0 until 10
    } yield (new java.sql.Timestamp(1700000000000L + d0 * 86400000L),
      (d0 * 100 + u).toLong, "view", 1.0, "{}")
    rows.toDF("ts", "user_id", "event_type", "value", "props")
      .withColumn("event_id", col("user_id"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = graft.queries.Catalog.all("q227_wau_hll").build(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getBoolean(2))).sortBy(_._1)
    assert(got.length == days.length)
    // every day's sketch estimate must sit inside the band vs the
    // calendar-exact count — in particular the post-gap days, where a
    // ROWS frame would report 70 instead of 50/60
    assert(got.forall(_._3), s"sketch window drifted off calendar: ${got.toSeq}")
    val exactByDay = got.map(t => t._1 -> t._2).toMap
    // day 8 covers days 2..8 -> present {2,5,6,7,8} = 50 users
    val day8 = java.time.Instant.ofEpochMilli(1700000000000L + 8 * 86400000L)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    assert(exactByDay(day8) == 50L, s"calendar-exact WAU: $exactByDay")
  }

  test("q240: heap-path churn equals the ranking-window recount; both arms engage") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // independent reference: per-day top-5 via the ranking window (the
    // oracle's formulation), RBO recounted with plain Scala
    val t5 = Tables(spark, sf(), "events")
      .select(expr("CAST(ts AS DATE)").as("day"), col("user_id"))
      .groupBy(col("day"), col("user_id")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("day")).orderBy(col("n").desc, col("user_id").asc)))
      .filter(col("rk") <= graft.queries.Windowed.ChurnTopK)
      .select(col("day"), col("user_id"), col("rk"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getInt(2)))
    val byDay = t5.groupBy(_._1)
    val w = graft.queries.TextAnalysis.RboSuffix1920.toMap
    val ref = byDay.keys.toSeq.sorted.flatMap { day =>
      val next = java.time.LocalDate.parse(day).plusDays(1).toString
      byDay.get(next).map { nx =>
        val nrk = nx.map(t => t._2 -> t._3).toMap
        day -> byDay(day).flatMap(t => nrk.get(t._2)
          .map(rb => w(math.max(t._3, rb)))).sum
      }
    }.toMap
    val got = graft.queries.Catalog.all("q240_topk_churn").build(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == ref, s"got $got\nref $ref")
    // the monitor must see BOTH a held board and a swept one
    assert(got.values.exists(_ > 0L) && got.values.exists(_ == 0L),
      s"churn arm degenerate: $got")
  }
}
