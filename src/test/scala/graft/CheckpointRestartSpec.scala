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
}
