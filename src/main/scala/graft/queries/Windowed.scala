package graft.queries

import graft.Tables
import graft.functions.ParityFns._
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Time-window operator surface (SURVEY.md §2.2 Q13/Q14, Q33–Q35): the
  * streaming window shapes exercised here in batch form so they can be
  * DuckDB-oracled — the same `window`/`session_window` expressions run
  * under `readStream` in the streaming specs.
  *
  * All window boundaries leave the engine as epoch-ms BIGINT: parquet
  * naive-vs-UTC timestamp annotations differ between engines, epoch ms
  * doesn't.
  */
object Windowed {

  def defs: ListMap[String, Q] = ListMap(

    // ---- Q14: as-of join — each event picks up the user's latest prior
    //      state. State times are derived into the events' January-2024
    //      range so matches actually vary per event.
    "q09_asof_join" -> Q(
      (s, d) => {
        val ev = Tables(s, d, "events").select("event_id", "user_id", "ts")
        val st = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0, CAST(o_orderkey % 720 AS INT), 0, 0)").as("st_ts"))
        AsOfJoin.leftAsOf(ev, "user_id", "ts", st, "o_custkey", "st_ts", "o_orderkey")
          .filter(col("asof").isNotNull)
          .select(col("event_id"), col("asof.o_orderkey").as("o_orderkey"))
      },
      Some("""WITH st AS (
             |  SELECT o_orderkey, o_custkey,
             |    TIMESTAMP '2024-01-01' + (o_orderkey % 720) * INTERVAL 1 HOUR AS st_ts
             |  FROM orders),
             |j AS (
             |  SELECT e.event_id, st.o_orderkey, row_number() OVER (
             |    PARTITION BY e.event_id ORDER BY st.st_ts DESC, st.o_orderkey DESC) AS rn
             |  FROM events e JOIN st ON st.o_custkey = e.user_id AND st.st_ts <= e.ts)
             |SELECT event_id, o_orderkey FROM j WHERE rn = 1""".stripMargin),
      headline = false),

    // ---- Q34: tumbling window aggregate (epoch-aligned 1h windows)
    "q30_window_tumbling" -> Q(
      (s, d) => {
        Tables(s, d, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_val"))
          .select(epochMs(col("window.start")).as("w_start"),
            col("event_type"), col("n"), col("sum_val"))
      },
      Some("""SELECT epoch_ms(ts) // 3600000 * 3600000 AS w_start, event_type,
             |  count(*) AS n, round(sum(value), 4) AS sum_val
             |FROM events GROUP BY 1, 2""".stripMargin),
      headline = false),

    // ---- Q34: sliding window (1h length, 30m slide → each event in 2)
    "q31_window_sliding" -> Q(
      (s, d) => {
        Tables(s, d, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_val"))
          .select(epochMs(col("window.start")).as("w_start"), col("n"), col("sum_val"))
      },
      Some("""WITH slid AS (
             |  SELECT epoch_ms(ts) // 1800000 * 1800000 - k * 1800000 AS w_start, value
             |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
             |SELECT w_start, count(*) AS n, round(sum(value), 4) AS sum_val
             |FROM slid GROUP BY w_start""".stripMargin)),

    // ---- Q35: session window (6h inactivity gap) per user
    "q32_session_window" -> Q(
      (s, d) => {
        Tables(s, d, "events")
          .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_val"))
          .select(col("user_id"), epochMs(col("session_window.start")).as("s_start"),
            col("n_events"), col("sum_val"))
      },
      Some("""WITH brk AS (
             |  SELECT user_id, ts, value, CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts, value, sum(new_s) OVER (
             |    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM brk)
             |SELECT user_id, epoch_ms(min(ts)) AS s_start,
             |  count(*) AS n_events, round(sum(value), 4) AS sum_val
             |FROM sess GROUP BY user_id, sid""".stripMargin),
      headline = true),

    // ---- event-sequence transition matrix: per-user Markov bigram
    //      counts over the event stream (lag window ordered by (ts,
    //      event_id) — event_id breaks timestamp ties, so the sequence
    //      is total-ordered and deterministic) plus the per-source-state
    //      transition probability — the behavioral-analytics sibling of
    //      q109's text bigrams (funnel drop-off, bot-loop detection,
    //      session-model fitting all start here). 100 TB shape: the
    //      per-user sort is the same user_id-partitioned exchange q32's
    //      sessionization pays (state ∝ one user's events, never
    //      global); transition rows collapse map-side to the #types²
    //      grain; the row-total normalizer joins at #types grain
    //      (broadcast). One exact integer division pair → double p.
    "q142_event_transitions" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val cnt = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"),
            lag(col("event_type"), 1).over(w).as("prev_type"))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val tot = cnt.groupBy(col("prev_type")).agg(sum(col("n")).as("t"))
        cnt.join(broadcast(tot), Seq("prev_type"))
          .select(col("prev_type"), col("event_type").as("next_type"), col("n"),
            (col("n").cast("double") / col("t").cast("double")).as("p"))
      },
      Some("""WITH tr AS (SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_type
             |  FROM events),
             |cnt AS (SELECT prev_type, event_type AS next_type,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS t
             |        FROM cnt GROUP BY 1)
             |SELECT c.prev_type, c.next_type, c.n,
             |  CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS p
             |FROM cnt c JOIN tot t USING (prev_type)""".stripMargin)),

    // ---- Q20/Q21 completeness: dense_rank/ntile/percent_rank/cume_dist
    //      and first/last over explicit frames
    "q66_window_ranks" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, d, "orders").select(
          col("o_orderkey"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("prk"),
          round(cume_dist().over(w), 6).as("cd"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(wFull).as("last_price"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(dense_rank() OVER w AS INT) AS drk,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  round(percent_rank() OVER w, 6) AS prk,
             |  round(cume_dist() OVER w, 6) AS cd,
             |  first_value(o_totalprice) OVER w AS first_price,
             |  last_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND UNBOUNDED FOLLOWING) AS last_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin))
  )
}
