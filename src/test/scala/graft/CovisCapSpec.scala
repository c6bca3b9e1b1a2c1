package graft

import org.apache.spark.sql.functions._

/** q186's hot-session cap, proven on PLANTED data (the fixture never
  * engages it — max 10 distinct items per session at every sf): two
  * 500-item bot sessions must each collapse to exactly CovisItemCap
  * kept items, the kept sets must be the cap smallest md5 coins
  * (recomputed independently via MessageDigest — full determinism, no
  * RNG), surviving pairs must be exactly the pairs of the kept-set
  * intersection, and the bounded-heap path must agree bit-for-bit with
  * the relational window fallback built inline from the same coin.
  */
class CovisCapSpec extends SparkSuite {

  private def coinOf(user: Long, day: String, item: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$user\u0001$day\u0001$item".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("planted bot sessions engage the cap deterministically") {
    import spark.implicits._
    val day1 = "2024-03-01"; val day2 = "2024-03-02"
    val rows = (0 until 500).flatMap(i =>
      Seq((999L, day1, i), (999L, day2, i)))
    val items = rows.toDF("user_id", "day", "item")
      .select(col("user_id"), col("day").cast("date").as("day"), col("item"))
    val cap = graft.queries.Windowed.CovisItemCap

    def keptOf(day: String): Set[Int] =
      (0 until 500).sortBy(i => (coinOf(999L, day, i), i)).take(cap).toSet
    val (k1, k2) = (keptOf(day1), keptOf(day2))
    assert(k1.size == cap && k2.size == cap)
    assert(k1 != k2, "per-session coins must differ across sessions")

    val common = (k1 & k2).toSeq.sorted
    val expected = (for {
      i <- common.indices; j <- (i + 1) until common.size
    } yield (common(i), common(j), 2L)).toSet
    assert(expected.size >= 3,
      s"planted overlap too small to exercise the floor: ${common.size} items")

    val got = graft.queries.Windowed.covisitationFrom(items)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected,
      s"kernel-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")

    // relational window fallback built inline from the same coin must
    // reproduce the bounded-heap result exactly
    import org.apache.spark.sql.expressions.Window
    val coin = conv(substring(md5(concat_ws("\u0001", col("user_id"),
      col("day"), col("item"))), 1, 15), 16, 10).cast("long").cast("double")
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(coin.asc, col("item").asc)
    val capped = items.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap).drop("rk")
    val a = capped.select(col("user_id"), col("day"), col("item").as("a"))
    val b = capped.select(col("user_id"), col("day"), col("item").as("b"))
    val viaWindow = a.join(b, Seq("user_id", "day"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= graft.queries.Windowed.CovisMinSessions)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaWindow == got, "heap path and window fallback disagree")
  }
}
