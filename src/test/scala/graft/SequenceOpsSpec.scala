package graft

import org.apache.spark.sql.functions._

/** q142_event_transitions vs a driver-side sequential recompute: sort
  * each user's events by (ts, event_id), count bigrams, normalize per
  * source state — the whole Markov-matrix contract pinned independently
  * of the window/aggregate machinery.
  */
class SequenceOpsSpec extends SparkSuite {

  test("q142 transition counts and probabilities match a sequential recompute") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.iterator.zip(ordered.iterator.drop(1)).map { case (a, b) => (a, b) }
    }
    val cnt = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tot = cnt.toSeq.groupBy(_._1._1).map { case (p, m) => p -> m.map(_._2).sum }
    val expected = cnt.map { case ((p, n), c) =>
      (p, n, c, c.toDouble / tot(p).toDouble)
    }.toSet
    val got = graft.queries.Catalog.all("q142_event_transitions")
      .build(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected, s"e.g. ${(got -- expected).take(3)}")
    assert(expected.nonEmpty, "fixture must contain >= 1 transition")
    // counts per source state sum to the row total (checks the
    // normalizer join keyed right) — summed over cnt, NOT the tuple set
    // (a Set would collapse equal counts)
    tot.keys.foreach { p =>
      val s = cnt.collect { case ((pp, _), c) if pp == p => c }.sum
      assert(s == tot(p), s"row total mismatch for '$p'")
    }
  }

  test("q145 anomaly scores match a sequential fit + score recompute") {
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val perUser = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq
    }
    val trans = perUser.toSeq.flatMap { case (u, seq) =>
      seq.zip(seq.drop(1)).map { case (a, b) => (u, a, b) }
    }
    val cnt = trans.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.size.toLong }
    val tot = cnt.toSeq.groupBy(_._1._1).map { case (p, m) => p -> m.map(_._2).sum }
    val scored = trans.groupBy(_._1).map { case (u, ts) =>
      val sb = ts.map { case (_, p, n) => bits(tot(p) / cnt((p, n))) }.sum
      (u, ts.size.toLong, sb, sb.toDouble / ts.size)
    }.toSeq
    val k = graft.queries.Windowed.AnomalyK
    val flagged = scored.sortBy(s => (-s._4, s._1)).take(k).map(_._1).toSet
    val expected = scored.map(s => (s._1, s._2, s._3, s._4, flagged(s._1))).toSet
    val got = graft.queries.Catalog.all("q145_transition_anomaly")
      .build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSet
    assert(got == expected, s"e.g. ${(got -- expected).take(3)}")
    assert(flagged.size == k)
  }

  test("q146 funnel matches a sequential per-user step walk") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2)))
    val byUser = ev.groupBy(_._1)
    def stepTimes(rows: Array[(Long, Long, String)]): (Option[Long], Option[Long], Option[Long]) = {
      val t1 = rows.filter(_._3 == "signup").map(_._2).minOption
      val t2 = t1.flatMap(a => rows.filter(r => r._3 == "view" && r._2 > a).map(_._2).minOption)
      val t3 = t2.flatMap(b => rows.filter(r => r._3 == "purchase" && r._2 > b).map(_._2).minOption)
      (t1, t2, t3)
    }
    val steps = byUser.values.map(rows => stepTimes(rows.toArray))
    val (n1, n2, n3) = (steps.count(_._1.isDefined).toLong,
      steps.count(_._2.isDefined).toLong, steps.count(_._3.isDefined).toLong)
    val expected = Set(
      (1, "signup", n1, n1.toDouble / n1),
      (2, "view", n2, n2.toDouble / n1),
      (3, "purchase", n3, n3.toDouble / n1))
    val got = graft.queries.Catalog.all("q146_event_funnel").build(spark, sf())
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected, s"got $got vs $expected")
    // at sf0.001 every signup user eventually completes the funnel
    // (~13 users × ~75 events each), so narrowing is only monotone here;
    // the driver's sf0.01 oracle run exercises the non-trivial drop-off
    assert(n1 >= n2 && n2 >= n3 && n3 > 0, s"funnel not monotone: $n1/$n2/$n3")
  }

  test("q147 cohort retention matches a sequential recompute") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("ts"))
      .collect().map(r => (r.getLong(0),
        // UTC explicitly: Spark's CAST(ts AS DATE) runs under the UTC
        // session zone; the JVM default zone must not leak in here
        r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate))
    val epoch = java.time.LocalDate.of(2024, 1, 1)
    def wk(dt: java.time.LocalDate): Long =
      java.time.temporal.ChronoUnit.DAYS.between(epoch, dt) / 7
    val first = ev.groupBy(_._1).map { case (u, rows) => u -> rows.map(r => wk(r._2)).min }
    val act = ev.map { case (u, dt) => (first(u), wk(dt) - first(u), u) }.distinct
    val cnt = act.groupBy(a => (a._1, a._2)).map { case (k, v) => k -> v.map(_._3).toSet.size.toLong }
    val size = cnt.collect { case ((c, 0L), n) => c -> n }
    val expected = cnt.map { case ((c, w), n) =>
      (c, w, n, n.toDouble / size(c))
    }.toSet
    val got = graft.queries.Catalog.all("q147_retention_cohorts").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected, s"e.g. ${(got -- expected).take(3)}")
    assert(expected.exists(_._2 > 0), "fixture must have multi-week activity")
  }

  test("q149 gap fill: planted gap days emit zero rows, spine covers the range") {
    import spark.implicits._
    // the fixture has events on every day, so the zero-fill branch needs
    // a planted corpus: events on Jan 1, 4, 5 → Jan 2-3 must read 0
    val dir = tmpDir("gapfill").toString
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    Seq((0L, t(1), 7L, "view", 1.5, "{}"), (1L, t(4), 7L, "view", 2.5, "{}"),
        (2L, t(4), 8L, "click", 1.0, "{}"), (3L, t(5), 7L, "view", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.queries.Catalog.all("q149_daily_gapfill").build(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      ("2024-01-01", 1L, 1L, 1.5), ("2024-01-02", 0L, 0L, 0.0),
      ("2024-01-03", 0L, 0L, 0.0), ("2024-01-04", 2L, 2L, 3.5),
      ("2024-01-05", 1L, 1L, 4.0)), s"got $got")
    // and on the real fixture: one row per day in range, all non-null
    val full = graft.queries.Catalog.all("q149_daily_gapfill").build(spark, sf())
      .collect()
    assert(full.length == 30, s"${full.length} days")
  }

  test("funnel progress: steps complete in order, across batches, state-bridged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
    val q = graft.streaming.StatefulOps
      .funnelProgress(in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
        Seq("signup", "view", "purchase"), "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("funnelprog").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.FunnelOut],
         _: Long) =>
          b.collect().foreach(r => got += ((r.user_id, r.step, r.step_name)))
          ()
      }.start()
    try {
      // user 1: signup then view in one batch; user 2: view BEFORE any
      // signup — out-of-order steps must NOT progress
      in.addData((1L, t(0), 0L, "signup"), (1L, t(1), 1L, "view"),
        (2L, t(0), 2L, "view"), (2L, t(1), 3L, "click"))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, 1, "signup"), (1L, 2, "view")), s"batch1: $got")
      // batch 2: user 1 purchases (cross-batch step 3 from state); user 2
      // finally signs up (step 1) — its earlier view stays unconsumed
      in.addData((1L, t(2), 4L, "purchase"), (2L, t(2), 5L, "signup"))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, 1, "signup"), (1L, 2, "view"),
        (1L, 3, "purchase"), (2L, 1, "signup")), s"batch2: $got")
      assert(got.size == 4, s"duplicate emission: $got")
    } finally q.stop()
  }

  test("transition monitor: cross-batch bridging transition emitted exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val q = graft.streaming.StatefulOps
      .transitionMonitor(in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
        "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("transmon").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.TransOut],
         _: Long) =>
          b.collect().foreach(r => got += ((r.user_id, r.prev, r.next)))
          ()
      }.start()
    try {
      // batch 1: user 1 emits one in-batch transition; user 2 has a
      // single event (state only, nothing emitted)
      in.addData((1L, t(0), 0L, "signup"), (1L, t(1), 1L, "view"),
        (2L, t(1), 2L, "view"))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "signup", "view")), s"batch1: $got")
      // batch 2: both users continue — the cross-batch bridges come from
      // STATE, each exactly once
      in.addData((1L, t(2), 3L, "purchase"), (2L, t(2), 4L, "error"))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "signup", "view"), (1L, "view", "purchase"),
        (2L, "view", "error")), s"batch2: $got")
      assert(got.size == 3, s"duplicate emission: $got")
    } finally q.stop()
  }

  test("scd2 monitor: closed intervals exactly once; TTL finalizes the open one") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def us(m: Int) = t(m).getTime * 1000L
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Option[Long], Long, Boolean)]
    val q = graft.streaming.StatefulOps
      .scd2Monitor(in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
        "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("scd2mon").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.Scd2Out],
         _: Long) =>
          b.collect().foreach(r => got += ((r.user_id, r.state, r.valid_from_us,
            r.valid_to_us, r.n_events, r.is_current)))
          ()
      }.start()
    try {
      // batch 1: u1 runs A,A then switches to B — the A interval closes
      // in-batch with its run count; u2 opens A (state only, no output)
      in.addData((1L, t(0), 0L, "A"), (1L, t(1), 1L, "A"), (1L, t(2), 2L, "B"),
        (2L, t(2), 3L, "A"))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "A", us(0), Some(us(2)), 2L, false)),
        s"batch1: $got")
      // batch 2: both users switch — the closes bridge from STATE
      in.addData((1L, t(3), 4L, "A"), (2L, t(3), 5L, "B"))
      q.processAllAvailable()
      assert(got.toSet == Set(
        (1L, "A", us(0), Some(us(2)), 2L, false),
        (1L, "B", us(2), Some(us(3)), 1L, false),
        (2L, "A", us(2), Some(us(3)), 1L, false)), s"batch2: $got")
      // batch 3: an unrelated user far in the future advances the
      // watermark past u1/u2's idle horizon — their OPEN intervals
      // finalize as is_current, exactly once each; u3's own interval
      // stays open (no output for it)
      in.addData((3L, t(50), 6L, "C"))
      q.processAllAvailable()
      assert(got.toSet == Set(
        (1L, "A", us(0), Some(us(2)), 2L, false),
        (1L, "B", us(2), Some(us(3)), 1L, false),
        (2L, "A", us(2), Some(us(3)), 1L, false),
        (1L, "A", us(3), None, 1L, true),
        (2L, "B", us(3), None, 1L, true)), s"batch3: $got")
      assert(got.size == 5, s"duplicate emission: $got")
    } finally q.stop()
  }

  test("attribution monitor: in-batch, cross-batch, stale-touch and no-touch arms") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def h(hr: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + hr * 3600000L)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    val q = graft.streaming.StatefulOps
      .attributionMonitor(
        in.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"),
        "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("attrmon").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.AttrOut],
         _: Long) =>
          b.collect().foreach(r => got += ((r.user_id, r.touch_type, r.value)))
          ()
      }.start()
    try {
      // batch 1: u1 click → purchase in-batch; u2 view (state only);
      // u3 purchase with no touch ever → 'none'
      in.addData((1L, h(0), 0L, "click", 0.0), (1L, h(1), 1L, "purchase", 10.0),
        (2L, h(0), 2L, "view", 0.0), (3L, h(1), 3L, "purchase", 7.0))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "click", 10.0), (3L, "none", 7.0)), s"batch1: $got")
      // batch 2: u2 purchases 2 h after its stored view (cross-batch
      // attribution from state); u1 purchases 30 h after its click —
      // outside the 24 h lookback, so 'none' whether the state survived
      // or the TTL already expired it (expiry is semantics-free)
      in.addData((2L, h(2), 4L, "purchase", 5.0), (1L, h(31), 5L, "purchase", 3.0))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "click", 10.0), (3L, "none", 7.0),
        (2L, "view", 5.0), (1L, "none", 3.0)), s"batch2: $got")
      assert(got.size == 4, s"duplicate emission: $got")
    } finally q.stop()
  }

  test("attribution monitor: purchase on horizon-expired state attributes 'none', no crash") {
    // behavioral coverage for the horizon guard: purchases keep
    // arriving as the watermark overtakes the stored touch's horizon —
    // attribution must flip to 'none' and the stream must stay healthy
    // whether the state was expired by the engine's cleanup batch or
    // dropped by the guard (the guard's crash path proper — data
    // landing in the SAME trigger the timeout would fire — is a
    // production-pacing race MemoryStream cannot split into separate
    // batches; see the operator comment).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def h(hr: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + hr * 3600000L)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    val q = graft.streaming.StatefulOps
      .attributionMonitor(
        in.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"),
        "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("attrstale").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.AttrOut],
         _: Long) =>
          b.collect().foreach(r => got += ((r.user_id, r.touch_type, r.value)))
          ()
      }.start()
    try {
      // batch 1: u1 touches at h0 (state stored, horizon h24+10m)
      in.addData((1L, h(0), 0L, "click", 0.0))
      q.processAllAvailable()
      // batch 2: u1 purchases at h10 (in-window) — watermark still h0-10m
      in.addData((1L, h(10), 1L, "purchase", 4.0))
      q.processAllAvailable()
      // batch 3: u1 purchases at h50 — this invocation sees the stored
      // h0 touch with the watermark now ≈ h10-10m < h24, fine; it
      // re-arms. batch 4 pushes the watermark past the horizon AND
      // delivers another purchase for u1 in the same trigger — the
      // crash path without the guard.
      in.addData((1L, h(50), 2L, "purchase", 5.0))
      q.processAllAvailable()
      in.addData((1L, h(51), 3L, "purchase", 6.0), (2L, h(60), 4L, "view", 0.0))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "click", 4.0), (1L, "none", 5.0),
        (1L, "none", 6.0)), s"$got")
    } finally q.stop()
  }

  test("cdc monitor: latest-wins, lower-seq late op suppressed, delete marker") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def us(m: Int) = t(m).getTime * 1000L
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Double, Long)]
    val q = graft.streaming.StatefulOps
      .cdcMonitor(in.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"),
        "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("cdcmon").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.CdcOut],
         _: Long) =>
          b.collect().foreach(r => got += ((r.user_id, r.op, r.last_type,
            r.last_value, r.last_us)))
          ()
      }.start()
    try {
      // batch 1: two ops for u1 in one batch — only the WINNER emits
      in.addData((1L, t(0), 0L, "A", 1.0), (1L, t(1), 1L, "B", 2.0))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "upsert", "B", 2.0, us(1))), s"batch1: $got")
      // batch 2: a LATE lower-sequence op for u1 (t0 < stored t1, still
      // above the watermark) must be absorbed silently; u2's first op is
      // the delete marker — emitted as a delete
      in.addData((1L, t(0), 2L, "C", 9.0), (2L, t(1), 3L, "error", 0.0))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "upsert", "B", 2.0, us(1)),
        (2L, "delete", "error", 0.0, us(1))), s"batch2: $got")
      // batch 3: a genuinely newer op re-upserts
      in.addData((1L, t(2), 4L, "D", 3.0))
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "upsert", "B", 2.0, us(1)),
        (2L, "delete", "error", 0.0, us(1)),
        (1L, "upsert", "D", 3.0, us(2))), s"batch3: $got")
      assert(got.size == 3, s"duplicate emission: $got")
    } finally q.stop()
  }

  test("cdc monitor over fixture events equals the q181 batch compaction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    val expected = graft.queries.Catalog.all("q181_cdc_compact")
      .build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Double, Long)]
    val q = graft.streaming.StatefulOps
      .cdcMonitor(in.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"),
        "1 hour")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("cdcfix").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.CdcOut],
         _: Long) =>
          b.collect().foreach(r => got += ((r.user_id, r.op, r.last_type,
            r.last_value, r.last_us)))
          ()
      }.start()
    try {
      in.addData(ev)
      q.processAllAvailable()
      val upserts = got.filter(_._2 == "upsert")
        .map(r => (r._1, r._3, r._4, r._5)).toSet
      val deleted = got.filter(_._2 == "delete").map(_._1).toSet
      assert(upserts == expected,
        s"stream-only=${(upserts -- expected).take(3)} " +
          s"batch-only=${(expected -- upserts).take(3)}")
      val allUsers = ev.map(_._1).toSet
      assert(deleted == allUsers -- expected.map(_._1),
        "delete rows must be exactly the keys the batch compaction dropped")
      assert(got.size == allUsers.size, "one changelog row per key")
    } finally q.stop()
  }

  test("attribution monitor over fixture events equals the q168 batch kernel") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    val expected = graft.queries.Windowed
      .attributedPurchases(Tables(spark, sf(), "events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3))).toSet
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, String)]
    val q = graft.streaming.StatefulOps
      .attributionMonitor(
        in.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"),
        "1 hour")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("attrfix").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.AttrOut],
         _: Long) =>
          b.collect().foreach { r =>
            val us = r.ts.getTime * 1000L + (r.ts.getNanos / 1000L) % 1000L
            got += ((r.user_id, us, r.value, r.touch_type))
          }
          ()
      }.start()
    try {
      in.addData(ev)
      q.processAllAvailable()
      assert(got.toSet == expected,
        s"stream-only=${(got.toSet -- expected).take(3)} " +
          s"batch-only=${(expected -- got.toSet).take(3)}")
      assert(got.size == expected.size, "duplicate emission")
    } finally q.stop()
  }
}
