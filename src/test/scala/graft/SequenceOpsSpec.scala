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
}
