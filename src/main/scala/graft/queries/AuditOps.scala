package graft.queries

import graft.Tables
import graft.functions.Gzip
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.immutable.ListMap

/** Audit-pipeline scalar operators exercised as oracle-checkable queries
  * over the fixture tables (the full file-ingest pipeline lives in
  * graft.ingest and is covered by streaming specs):
  *
  *  - R4 filename→PID projection (reference OraTrcNameHolder.java:34-35:
  *    second-to-last `_`-delimited token of the file name)
  *  - R9/R10 conditional gzip + sniffing decompress round-trip
  *    (reference GzipUtil.java:27-70, KinesisJob.java:66-73)
  *  - Q32 XML parse (from_xml of the §1.2 audit-record shape)
  *
  * Oracle trick: each query *constructs* its input deterministically from
  * a fixture table, applies the operator, and the oracle states the
  * algebraic result — so a broken operator hash-mismatches immediately.
  */
object AuditOps {

  private val auditXmlSchema = StructType(Seq(
    StructField("Session_Id", LongType),
    StructField("DB_User", StringType),
    StructField("Returncode", IntegerType)))

  def defs: ListMap[String, Q] = ListMap(

    // ---- R4: Oracle audit-file-name → server-process PID
    "q35_pid_parse" -> Q(
      (s, d) => {
        Tables(s, d, "part")
          .withColumn("fname",
            concat(lit("/u01/app/oracle/audit/orcl_ora_"),
              col("p_partkey"), lit("_"), col("p_size"), lit(".xml")))
          .select(col("p_partkey"),
            nullif(regexp_extract(col("fname"), "_([^_]+)_[^_]*$", 1), lit("")).as("pid"))
      },
      Some("""SELECT p_partkey,
             |  nullif(regexp_extract('/u01/app/oracle/audit/orcl_ora_' || p_partkey
             |    || '_' || p_size || '.xml', '_([^_]+)_[^_]*$', 1), '') AS pid
             |FROM part""".stripMargin)),

    // ---- Q32: XML audit-record parse round-trip via from_xml
    "q33_xml_parse" -> Q(
      (s, d) => {
        Tables(s, d, "orders")
          .withColumn("payload", format_string(
            "<AuditRecord><Session_Id>%d</Session_Id><DB_User>u%d</DB_User><Returncode>%d</Returncode></AuditRecord>",
            col("o_orderkey"), col("o_custkey"), pmod(col("o_orderkey"), lit(7))))
          .withColumn("rec", from_xml(col("payload"), auditXmlSchema))
          .select(
            col("rec.Session_Id").as("session_id"),
            col("rec.DB_User").as("db_user"),
            col("rec.Returncode").as("returncode"))
      },
      Some("""SELECT o_orderkey AS session_id,
             |  'u' || o_custkey AS db_user,
             |  CAST(o_orderkey % 7 AS INT) AS returncode
             |FROM orders""".stripMargin)),

    // ---- R9/R10: conditional gzip (>512 bytes) + sniffing decompress.
    //      Small docs pass through uncompressed, large ones round-trip
    //      through GZIPOutputStream — `ok` is false if either path breaks.
    "q34_gzip_roundtrip" -> Q(
      (s, d) => {
        Tables(s, d, "documents")
          .withColumn("wire", Gzip.gzip_if_large(col("text"), lit(512)))
          .select(col("doc_id"),
            (length(col("wire")) < length(col("text")) * 2 + 64).as("bounded"),
            (Gzip.gunzip_str(col("wire")) === col("text")).as("ok"))
      },
      Some("""SELECT doc_id, true AS bounded, true AS ok FROM documents""".stripMargin))
  )
}
