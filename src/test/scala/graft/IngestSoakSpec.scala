package graft

import java.nio.file.{Files, StandardCopyOption}

import scala.collection.mutable

import graft.ingest.{AuditIngest, SettleGate}
import org.apache.spark.sql.functions._

/** Soak evidence for the ingest path (BASELINE.md's latency gate proves
  * one delivery; this proves the pipeline under sustained load): files
  * arrive continuously at ~3/s into the RAW dir, the settle-gate mover
  * promotes them to the watched dir, the stream commits them to the
  * mirror — and HALFWAY THROUGH, the stream is stopped for ~15 arrivals
  * and restarted from its checkpoint while the producer keeps going.
  *
  * Asserts the properties a long-running agent actually needs:
  *  - ZERO LOST files: every produced file reaches the mirror;
  *  - ZERO DUPLICATES across the restart: exactly one mirror row per
  *    file (the checkpointed offset log + idempotent batch overwrite —
  *    replayed batches rewrite, never append);
  *  - bounded latency: per-file commit latency is derived post-hoc from
  *    the mirror part-files' modification times (no polling in the hot
  *    loop), p50 within the documented steady-state envelope and p99
  *    bounded even across the restart window.
  *
  * Sized at ~150 files / ~50 s of production so the whole suite stays
  * runnable per-commit; the arrival rate, restart, and assertions are
  * the full soak semantics.
  */
class IngestSoakSpec extends SparkSuite {

  private def xml(padBytes: Int): String =
    "<?xml version=\"1.0\"?><Audit><AuditRecord><Audit_Type>1</Audit_Type>" +
      "<Sql_Text>/* " + "x" * padBytes + " */</Sql_Text></AuditRecord></Audit>"

  test("soak: sustained arrivals + mid-soak restart — zero lost, zero dup, bounded p99") {
    val raw = tmpDir("soak_raw"); val ingest = tmpDir("soak_ingest")
    val work = tmpDir("soak_work")
    val mirror = s"$work/mirror"; val dlq = s"$work/dlq"; val ckpt = s"$work/ckpt"

    val mover = SettleGate.startMover(raw, ingest, settleMs = 100, pollMs = 100)
    def start() = AuditIngest.startStream(spark, ingest.toString, mirror, dlq, ckpt,
      host = "soakhost", triggerMs = 500)

    var q = start()
    val sentAt = mutable.LinkedHashMap.empty[String, Long]
    val total = 150
    val restartAt = 60      // stop after this arrival...
    val downFor = 15        // ...restart ~15 arrivals (~5 s) later
    try {
      for (i <- 1 to total) {
        val name = f"orcl_ora_${1000 + i}%d_$i%d.xml"
        val tmp = Files.createTempFile("soak", ".tmp")
        Files.writeString(tmp, xml(2048))
        Files.move(tmp, raw.resolve(name), StandardCopyOption.ATOMIC_MOVE)
        sentAt(name) = System.currentTimeMillis()
        if (i == restartAt) q.stop()                    // producer keeps going
        if (i == restartAt + downFor) q = start()       // resume from checkpoint
        Thread.sleep(330)
      }

      // drain: every produced file must reach the mirror
      def committed(): Map[String, (Long, Long)] = scala.util.Try {
        spark.read.parquet(mirror)
          .select(regexp_extract(col("key"), "([^/:]+\\.xml)$", 1).as("name"),
            unix_millis(col("_metadata.file_modification_time")).as("cms"))
          .groupBy(col("name"))
          .agg(count(lit(1)).as("n"), max(col("cms")).as("cms"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      }.getOrElse(Map.empty)
      val deadline = System.currentTimeMillis() + 90000
      var seen = committed()
      while (seen.size < total && System.currentTimeMillis() < deadline) {
        Thread.sleep(500); seen = committed()
      }

      val lost = sentAt.keySet -- seen.keySet
      assert(lost.isEmpty, s"${lost.size} files lost across the soak: ${lost.take(5)}")
      val dups = seen.filter(_._2._1 > 1)
      assert(dups.isEmpty, s"duplicated mirror rows after restart: ${dups.take(5)}")
      assert(seen.size == total, s"mirror holds ${seen.size} of $total files")

      // latency: commit part-file mtime - producer move time. Part files
      // batch several arrivals; the part mtime is an upper bound for all
      // of them, so the percentiles below are conservative.
      val lats = sentAt.map { case (name, t0) => seen(name)._2 - t0 }.toSeq.sorted
      val p50 = lats(lats.size / 2)
      val p99 = lats((lats.size * 99) / 100)
      info(s"soak latency over $total files: p50 ${p50} ms, p99 ${p99} ms, max ${lats.last} ms")
      // p50: steady-state envelope (500 ms trigger + 100/100 ms settle
      // gate) with the documented 2-4x VM variance headroom
      assert(p50 <= 4000, s"soak p50 = $p50 ms > 4000 ms")
      // p99: must absorb the deliberate ~5 s restart window but stay
      // bounded — a recovery that takes tens of seconds fails here
      assert(p99 <= 20000, s"soak p99 = $p99 ms > 20000 ms")
    } finally { q.stop(); mover.interrupt() }
  }

  test("append race, tick level: a file growing between polls never moves early") {
    // the reference's core race (OraaudKafka.java:278-315): the writer is
    // still appending when the poller first observes the file — its size
    // changes between polls. Deterministic clock, no sleeps.
    import java.nio.file.attribute.FileTime
    import java.nio.file.StandardOpenOption
    val raw = tmpDir("race_raw"); val ingest = tmpDir("race_ingest")
    val f = raw.resolve("orcl_ora_4242_1.xml")
    val settle = 1000L
    var clock = 1000000L
    def tick() = SettleGate.tick(raw, ingest, settle, now = () => clock)

    Files.writeString(f, "<?xml version=\"1.0\"?><Audit><AuditRecord>")
    Files.setLastModifiedTime(f, FileTime.fromMillis(clock))
    clock += settle - 1
    assert(tick().isEmpty, "file moved before settleMs elapsed")

    Files.writeString(f, "</AuditRecord></Audit>", StandardOpenOption.APPEND)
    Files.setLastModifiedTime(f, FileTime.fromMillis(clock))
    clock += settle - 1
    assert(tick().isEmpty, "an append between polls must reset the settle gate")

    clock += 1
    assert(tick() == Seq("orcl_ora_4242_1.xml"))
    val shipped = Files.readString(ingest.resolve("orcl_ora_4242_1.xml"))
    assert(shipped.endsWith("</AuditRecord></Audit>"),
      s"mover shipped a half-written file: ...${shipped.takeRight(40)}")
  }

  test("append race, end to end: chunked writes ship exactly one complete payload") {
    import java.nio.file.StandardOpenOption
    val raw = tmpDir("race2_raw"); val ingest = tmpDir("race2_ingest")
    val work = tmpDir("race2_work")
    val mirror = s"$work/mirror"; val dlq = s"$work/dlq"; val ckpt = s"$work/ckpt"
    val chunks = Seq(
      "<?xml version=\"1.0\"?><Audit>",
      "<AuditRecord><Audit_Type>1</Audit_Type>",
      "<Sql_Text>select 1</Sql_Text></AuditRecord>",
      "</Audit>")
    val full = chunks.mkString.replaceAll("\\r?\\n", "")

    val mover = SettleGate.startMover(raw, ingest, settleMs = 800, pollMs = 100)
    val q = AuditIngest.startStream(spark, ingest.toString, mirror, dlq, ckpt,
      host = "racehost", triggerMs = 300)
    try {
      // a slow writer: one chunk every ~300 ms, each append inside the
      // mover's poll cadence, so the file is observed part-written
      // several times before it settles
      val f = raw.resolve("orcl_ora_7777_1.xml")
      Files.writeString(f, chunks.head)
      chunks.tail.foreach { c =>
        Thread.sleep(300)
        Files.writeString(f, c, StandardOpenOption.APPEND)
      }
      def mirrorRows(): Seq[(String, String)] = scala.util.Try {
        spark.read.parquet(mirror).select(col("key"), col("value"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      }.getOrElse(Seq.empty)
      val deadline = System.currentTimeMillis() + 30000
      while (mirrorRows().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(250)

      val rows = mirrorRows()
      assert(rows.size == 1, s"expected exactly one mirror row, got $rows")
      assert(rows.head._2 == full,
        s"mirror holds a partial payload:\n${rows.head._2}\nexpected:\n$full")
      // nothing was ever shipped incomplete, so the DLQ must stay empty
      val dlqRows = scala.util.Try(spark.read.parquet(dlq).count()).getOrElse(0L)
      assert(dlqRows == 0L, s"half-written file reached the DLQ: $dlqRows rows")
    } finally { q.stop(); mover.interrupt() }
  }
}
