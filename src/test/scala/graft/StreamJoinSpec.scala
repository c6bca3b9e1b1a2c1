package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** SURVEY.md §2.2 Q37: stream-static enrichment and stream-stream join
  * within a watermark, and Q25's streaming exact dedup
  * (dropDuplicatesWithinWatermark).
  */
class StreamJoinSpec extends SparkSuite {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("stream-static join enriches a stream with a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Timestamp, Long, Double)]
    val enriched = in.toDF().toDF("ts", "user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), 1L, 10.0), (ts(2), 2L, 20.0), (ts(3), 9L, 30.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("user_id", "tier").as[(Long, Option[String])].collect().toSet
      assert(rows == Set((1L, Some("gold")), (2L, Some("silver")), (9L, None)))
    } finally q.stop()
  }

  test("stream-stream inner join correlates within the watermark window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[(Timestamp, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "item").withWatermark("c_ts", "10 seconds")
    val v = views.toDF().toDF("v_ts", "v_item").withWatermark("v_ts", "10 seconds")
    val joined = c.join(v,
      col("item") === col("v_item") &&
        col("v_ts") >= col("c_ts") && col("v_ts") <= col("c_ts") + expr("interval 5 seconds"))
    val q = joined.writeStream.format("memory").queryName("joined")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((ts(10), 1L), (ts(10), 2L))
      views.addData((ts(12), 1L), (ts(30), 2L)) // 2L's view is outside +5s
      q.processAllAvailable()
      clicks.addData((ts(100), 99L)); views.addData((ts(100), 98L)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("joined").select("item").as[Long].collect().toSeq
      assert(rows == Seq(1L))
    } finally q.stop()
  }

  test("stream-stream left outer join emits unmatched rows after watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[(Timestamp, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "item").withWatermark("c_ts", "5 seconds")
    val v = views.toDF().toDF("v_ts", "v_item").withWatermark("v_ts", "5 seconds")
    val joined = c.join(v,
      col("item") === col("v_item") &&
        col("v_ts") >= col("c_ts") && col("v_ts") <= col("c_ts") + expr("interval 5 seconds"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("louter")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((ts(10), 1L), (ts(10), 2L))
      views.addData((ts(12), 1L))
      q.processAllAvailable()
      clicks.addData((ts(200), 99L)); views.addData((ts(200), 98L))
      q.processAllAvailable()
      val rows = spark.table("louter")
        .select(col("item"), col("v_item").isNull.as("unmatched"))
        .as[(Long, Boolean)].collect().toSet
      assert(rows.contains((1L, false))) // matched within interval
      assert(rows.contains((2L, true)))  // emitted as null-padded after close
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups a keyed stream across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(Timestamp, String)]
    val deduped = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
      q.processAllAvailable()
      in.addData((ts(4), "a"), (ts(5), "c")) // "a" still within watermark → dropped
      q.processAllAvailable()
      val ks = spark.table("deduped").select("k").as[String].collect().toSeq.sorted
      assert(ks == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("streaming SimHash dedup drops fingerprint-equal rewordings within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(Timestamp, Long, String)]
    val deduped = graft.streaming.StatefulOps.simhashDedup(
      in.toDF().toDF("ts", "doc_id", "text"), "text", "ts", "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("sh_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (ts(1), 1L, "the quick brown fox jumps over the lazy dog"),
        (ts(3), 3L, "an entirely different document about spark streams"))
      q.processAllAvailable()
      // word-permuted near-dup: exact-text dedup would pass it, but the
      // count-based fingerprint is order-free → same simhash → dropped
      in.addData(
        (ts(5), 5L, "the lazy dog jumps over the quick brown fox"),
        (ts(6), 6L, "an entirely different document about spark streams"),
        (ts(7), 7L, "a genuinely novel third text with fresh words"))
      q.processAllAvailable()
      val ids = spark.table("sh_dedup").select("doc_id").as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 3L, 7L),
        s"expected the permuted 5L and exact-dup 6L suppressed, got $ids")
      // sanity: the survivor set still carries distinct fingerprints
      val n = spark.table("sh_dedup").select("simhash").distinct().count()
      assert(n == 3)
    } finally q.stop()
  }

  test("streaming SRP dedup drops rescaled re-embeddings within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val v1 = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val v2 = Array.tabulate(16)(i => math.cos(i + 1).toFloat)
    val in = MemoryStream[(Timestamp, Long, Array[Float])]
    val deduped = graft.streaming.StatefulOps.srpDedup(
      in.toDF().toDF("ts", "vec_id", "embedding"), "embedding", "ts", "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("srp_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), 1L, v1), (ts(2), 2L, v2))
      q.processAllAvailable()
      // positive rescaling never flips a dot sign → identical sketch →
      // dropped, where exact-value dedup would keep it
      in.addData((ts(5), 5L, v1.map(_ * 1.25f)), (ts(6), 6L, v2))
      q.processAllAvailable()
      val ids = spark.table("srp_dedup").select("vec_id").as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L), s"expected rescaled 5L and exact-dup 6L suppressed, got $ids")
    } finally q.stop()
  }

  test("streaming MinHash LSH emits verified near-dup pairs across batches, state expires") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val other = "completely different words entirely here nothing shared at all between them"
    val in = MemoryStream[(Timestamp, Long, String)]
    val pairs = graft.streaming.StatefulOps.minhashPairsStream(
      in.toDF().toDF("ts", "doc_id", "text"), "text", "ts", "10 seconds")
    val q = pairs.toDF().writeStream.format("memory").queryName("mh_pairs")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), 1L, base), (ts(2), 2L, other))
      q.processAllAvailable()
      // cross-batch: 5 is a near-dup of 1 (one appended token), 6 an
      // exact dup of 1 — both must pair against state from batch 1
      in.addData((ts(5), 5L, base + " mike"), (ts(6), 6L, base))
      q.processAllAvailable()
      def pairSet() = spark.table("mh_pairs").select("doc_a", "doc_b")
        .distinct().as[(Long, Long)].collect().toSet
      assert(pairSet() == Set((1L, 5L), (1L, 6L), (5L, 6L)), s"got ${pairSet()}")
      val jac = spark.table("mh_pairs").filter(col("doc_a") === 1 && col("doc_b") === 6)
        .select("jaccard").as[Double].collect().head
      assert(jac == 1.0, s"exact dup must verify at jaccard 1.0, got $jac")
      // advance the watermark past the bucket TTL with unrelated data →
      // the bucket's state is removed on this batch's timeout pass...
      in.addData((ts(40), 90L, "unrelated filler advancing the watermark only"))
      q.processAllAvailable()
      // ...so a later re-arrival of the same text starts a FRESH bucket:
      // no pairs against the expired members
      in.addData((ts(41), 9L, base))
      q.processAllAvailable()
      assert(pairSet() == Set((1L, 5L), (1L, 6L), (5L, 6L)),
        s"doc 9 must not pair with expired state, got ${pairSet()}")
    } finally q.stop()
  }
}
