package graft

import java.nio.file.{Files, Path}

import graft.ingest.{AuditIngest, AuditModel, SettleGate}
import org.apache.spark.sql.functions._

/** End-to-end golden test of the ingest pipeline (SURVEY.md §5 item 3):
  * settle gate → streaming file source → envelope → mirror/DLQ split →
  * delete-after-commit → checkpoint restart redelivers nothing.
  */
class IngestSpec extends SparkSuite {

  private val Host = "testhost"

  private def writeXml(dir: Path, name: String, complete: Boolean): Path = {
    val body =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Audit>
        | <AuditRecord><Audit_Type>1</Audit_Type><Session_Id>42</Session_Id>
        |  <DB_User>SCOTT</DB_User><Action>3</Action><Returncode>0</Returncode>
        |  <Sql_Text>SELECT 1 FROM dual</Sql_Text></AuditRecord>
        | <AuditRecord><Audit_Type>1</Audit_Type><Session_Id>43</Session_Id>
        |  <DB_User>HR</DB_User><Action>2</Action><Returncode>0</Returncode>
        |  <Sql_Text>UPDATE t SET x = 1</Sql_Text></AuditRecord>
        |</Audit>
        |""".stripMargin
    val text = if (complete) body else body.substring(0, body.length / 2)
    Files.writeString(dir.resolve(name), text)
  }

  test("settle gate moves only settled xml files, atomically") {
    val raw = tmpDir("raw"); val ingest = tmpDir("ingest")
    writeXml(raw, "orcl_ora_111_1.xml", complete = true)
    writeXml(raw, "orcl_ora_222_2.xml", complete = true)
    Files.writeString(raw.resolve("not_audit.txt"), "ignored")

    // nothing settles when everything is too fresh
    val t0 = System.currentTimeMillis()
    assert(SettleGate.tick(raw, ingest, settleMs = 60000, now = () => t0).isEmpty)
    // everything settles once the clock passes the settle window
    val moved = SettleGate.tick(raw, ingest, settleMs = 60000, now = () => t0 + 120000)
    assert(moved.toSet == Set("orcl_ora_111_1.xml", "orcl_ora_222_2.xml"))
    assert(Files.exists(raw.resolve("not_audit.txt"))) // non-xml untouched
    assert(!Files.exists(raw.resolve("orcl_ora_111_1.xml")))
    assert(Files.exists(ingest.resolve("orcl_ora_111_1.xml")))
  }

  test("streaming ingest: mirror complete, DLQ truncated, delete source, idempotent restart") {
    val ingest = tmpDir("ingest"); val mirror = tmpDir("mirror")
    val dlq = tmpDir("dlq"); val ckpt = tmpDir("ckpt")
    writeXml(ingest, "orcl_ora_100_1.xml", complete = true)
    writeXml(ingest, "orcl_ora_200_2.xml", complete = true)
    writeXml(ingest, "orcl_ora_300_3.xml", complete = false)

    val q = AuditIngest.startStream(spark, ingest.toString, mirror.toString,
      dlq.toString, ckpt.toString, Host, triggerMs = 100)
    try q.processAllAvailable() finally q.stop()

    val m = spark.read.parquet(mirror.toString)
    assert(m.count() == 2)
    // R8 key contract + R6 newline strip + R4 pid lineage
    val row = m.filter(col("src_file").endsWith("orcl_ora_100_1.xml"))
      .select("key", "value", "src_pid", "src_file").head()
    assert(row.getString(0) == s"$Host:${row.getString(3)}")
    assert(!row.getString(1).contains("\n"))
    assert(row.getString(1).endsWith("</Audit>"))
    assert(row.getString(2) == "100")

    val d = spark.read.parquet(dlq.toString)
    assert(d.count() == 1)
    assert(d.head().getAs[String]("src_file").endsWith("orcl_ora_300_3.xml"))

    // R14: cleanSource=delete removes batch N's files when the source
    // commits N — at batch N+1 construction, strictly after the commit
    // log records N. Feed a batch N+1 and watch batch 0's files go.
    assert(Files.exists(ingest.resolve("orcl_ora_100_1.xml")),
      "batch-0 files must survive until their commit is recorded")
    writeXml(ingest, "orcl_ora_400_4.xml", complete = true)
    val q1b = AuditIngest.startStream(spark, ingest.toString, mirror.toString,
      dlq.toString, ckpt.toString, Host, triggerMs = 100)
    try {
      q1b.processAllAvailable()
      var waited = 0
      while (Files.exists(ingest.resolve("orcl_ora_100_1.xml")) && waited < 15000) {
        Thread.sleep(100); waited += 100
      }
    } finally q1b.stop()
    assert(!Files.exists(ingest.resolve("orcl_ora_100_1.xml")))
    assert(!Files.exists(ingest.resolve("orcl_ora_300_3.xml")))
    assert(spark.read.parquet(mirror.toString).count() == 3)

    // checkpoint restart: no new files ⇒ nothing redelivered
    val q2 = AuditIngest.startStream(spark, ingest.toString, mirror.toString,
      dlq.toString, ckpt.toString, Host, triggerMs = 100)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(mirror.toString).count() == 3)

    // Q32: the mirrored payload parses into §1.2 audit records
    val recs = AuditModel.parseAuditXml(
      spark.read.parquet(mirror.toString), "value")
    assert(recs.count() == 6) // 3 complete files × 2 AuditRecords
    assert(recs.select("rec.DB_User").as[String](spark.implicits.newStringEncoder)
      .collect().toSet == Set("SCOTT", "HR"))
  }

  test("ingest latency: file appearance → mirror commit (BASELINE target ≤ 2 s)") {
    val ingest = tmpDir("lat_in"); val mirror = tmpDir("lat_mir")
    val dlq = tmpDir("lat_dlq"); val ckpt = tmpDir("lat_ckpt")
    val q = AuditIngest.startStream(spark, ingest.toString, mirror.toString,
      dlq.toString, ckpt.toString, Host, triggerMs = 500)
    try {
      q.processAllAvailable() // drain the empty initial batch
      val t0 = System.nanoTime()
      writeXml(ingest, "orcl_ora_777_1.xml", complete = true)
      var seen = false
      while (!seen && (System.nanoTime() - t0) < 30e9) {
        Thread.sleep(50)
        seen = try spark.read.parquet(mirror.toString).count() > 0
        catch { case _: Throwable => false }
      }
      val latencyMs = (System.nanoTime() - t0) / 1e6
      info(f"file→mirror latency: $latencyMs%.0f ms (target ≤ 2000 ms on quiet hardware)")
      assert(seen, "file never reached the mirror")
      // loose bound: CI noise-tolerant; the measured value is the evidence
      assert(latencyMs < 30000)
    } finally q.stop()
  }

  test("batch backlog scan (R1) produces the same envelope") {
    val dir = tmpDir("backlog")
    writeXml(dir, "orcl_ora_555_7.xml", complete = true)
    val env = AuditIngest.readBatch(spark, dir.toString, Host)
    assert(env.count() == 1)
    val r = env.head()
    assert(r.getAs[String]("key").startsWith(s"$Host:"))
    assert(r.getAs[Boolean]("complete"))
    assert(r.getAs[String]("src_pid") == "555")
    // Q4: the kafka frame is exactly (key, value)
    assert(AuditIngest.kafkaFrame(env).columns.toSeq == Seq("key", "value"))
  }
}
