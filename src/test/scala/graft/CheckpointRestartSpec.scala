package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Exactly-once across restart: a watermarked windowed aggregation over
  * a file source, stopped and restarted from its checkpoint, emits each
  * closed window exactly once to the parquet sink.
  */
class CheckpointRestartSpec extends SparkSuite {

  private def writeEvents(dir: Path, name: String, rows: Seq[(String, Double)]): Unit = {
    val body = rows.map { case (ts, v) => s"""{"ts":"$ts","v":$v}""" }.mkString("\n")
    Files.writeString(dir.resolve(name), body)
  }

  test("windowed aggregation restart emits each window exactly once") {
    val src = tmpDir("cpr_src"); val out = tmpDir("cpr_out"); val ckpt = tmpDir("cpr_ckpt")
    val schema = StructType.fromDDL("ts TIMESTAMP, v DOUBLE")

    def startQuery() = spark.readStream.schema(schema).json(src.toString)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("sum_v"), col("n"))
      .writeStream
      .format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()

    // phase 1: events up to t=25 close windows [0,10) and [10,20)
    writeEvents(src, "f1.json", Seq(
      ("2024-01-01T00:00:02Z", 1.0), ("2024-01-01T00:00:07Z", 2.0),
      ("2024-01-01T00:00:12Z", 4.0), ("2024-01-01T00:00:25Z", 8.0)))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: restart from the checkpoint; t=100 closes [20,30)
    writeEvents(src, "f2.json", Seq(("2024-01-01T00:01:40Z", 16.0)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out.toString)
      .select(date_format(col("w"), "HH:mm:ss").as("w"), col("sum_v"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq.sorted
    // each closed window appears exactly once, with the full sums
    assert(got == Seq(
      ("00:00:00", 3.0, 2L),
      ("00:00:10", 4.0, 1L),
      ("00:00:20", 8.0, 1L)))
  }

  test("abMonitor restart from checkpoint emits each experiment window exactly once") {
    val src = tmpDir("abr_src"); val out = tmpDir("abr_out"); val ckpt = tmpDir("abr_ckpt")
    val schema = StructType.fromDDL(
      "user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE")
    def writeRows(name: String, rows: Seq[(Long, String, String, Double)]): Unit = {
      val body = rows.map { case (u, ts, et, v) =>
        s"""{"user_id":$u,"ts":"$ts","event_type":"$et","value":$v}"""
      }.mkString("\n")
      java.nio.file.Files.writeString(src.resolve(name), body)
    }
    def startQuery() = graft.streaming.StatefulOps.abMonitor(
        spark.readStream.schema(schema).json(src.toString),
        "0 seconds", "10 seconds", 150.0)
      .writeStream.format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()

    // users 0,1,2 land in md5-variant 0; 3,4 in variant 1 (pinned below).
    // phase 1: window [0,10) gets a variant-0 conversion + a variant-1
    // view; the t=25 event closes it
    writeRows("f1.json", Seq(
      (0L, "2024-01-01T00:00:02Z", "purchase", 999.0),
      (3L, "2024-01-01T00:00:04Z", "view", 1.0),
      (4L, "2024-01-01T00:00:25Z", "view", 1.0)))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2: restart; t=100 closes [20,30) — its row must appear
    // exactly once and phase-1 windows must NOT re-emit
    writeRows("f2.json", Seq((1L, "2024-01-01T00:01:40Z", "view", 1.0)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1).toSeq
    val base = 1704067200000L // 2024-01-01T00:00:00Z epoch ms
    // [0,10): u0 (arm 0) converts, u3 (arm 1) views → n0=1,c0=1,n1=1,c1=0,
    //   z = (0/1 - 1/1) / sqrt(0.5·0.5·(1/1 + 1/1)) = -√2
    // [20,30): u4 (arm 1) views → n0=0 triggers the empty-arm guard, z=0
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) == Seq(
      (base, 1L, 1L, 1L, 0L), (base + 20000L, 0L, 0L, 1L, 0L)),
      s"each closed window exactly once with full counts: ${got.mkString(", ")}")
    assert(math.abs(got(0)._6 - (-math.sqrt(2.0))) < 1e-12 && got(1)._6 == 0.0,
      s"z values: ${got.map(_._6)}")
  }
}
