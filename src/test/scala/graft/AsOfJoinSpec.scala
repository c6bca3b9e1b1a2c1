package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks latest state <= event time, with <= and tie-break semantics") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // between s1 and s2
      (2L, 10L, ts("2024-01-01 12:00:00")), // exactly at s2 → matches s2
      (3L, 10L, ts("2024-01-01 09:00:00")), // before everything → no match
      (4L, 20L, ts("2024-01-01 10:30:00")) // tie: two states at 10:00 → max tb
    ).toDF("event_id", "k", "ts")
    val states = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00")),
      (101L, 10L, ts("2024-01-01 12:00:00")),
      (200L, 20L, ts("2024-01-01 10:00:00")),
      (201L, 20L, ts("2024-01-01 10:00:00"))
    ).toDF("state_id", "k", "sts")

    val got = AsOfJoin.leftAsOf(events, "k", "ts", states, "k", "sts", "state_id")
      .select($"event_id", $"asof.state_id".as("state_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap

    assert(got(1L) === Some(100L))
    assert(got(2L) === Some(101L)) // state at exactly event time matches
    assert(got(3L) === None)
    assert(got(4L) === Some(201L)) // equal-time states: greatest tiebreak
  }

  test("matches naive join+row_number formulation on fixture data") {
    val ev = Tables(spark, sf(), "events").select("event_id", "user_id", "ts")
    val st = Tables(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").as("sts"))
    val fast = AsOfJoin.leftAsOf(ev, "user_id", "ts", st, "o_custkey", "sts", "o_orderkey")
      .filter(col("asof").isNotNull)
      .select(col("event_id"), col("asof.o_orderkey").as("ok"))
    val naive = ev.join(st, ev("user_id") === st("o_custkey") && st("sts") <= ev("ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id"))
          .orderBy(col("sts").desc, col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey").as("ok"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }
}
