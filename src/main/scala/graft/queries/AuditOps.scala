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

    // ---- Q32: XML audit-record parse round-trip via from_xml, plus
    //      schema_of_xml inference over the same record shape — the
    //      inferred-DDL string is emitted and the oracle pins the
    //      literal (XML inference sorts fields, numerics widen to
    //      BIGINT), so an inference regression hash-mismatches.
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
            col("rec.Returncode").as("returncode"),
            schema_of_xml(lit(
              "<AuditRecord><Session_Id>1</Session_Id><DB_User>u1</DB_User><Returncode>0</Returncode></AuditRecord>"))
              .as("x_schema"))
      },
      Some("""SELECT o_orderkey AS session_id,
             |  'u' || o_custkey AS db_user,
             |  CAST(o_orderkey % 7 AS INT) AS returncode,
             |  'STRUCT<DB_User: STRING, Returncode: BIGINT, Session_Id: BIGINT>' AS x_schema
             |FROM orders""".stripMargin)),

    // ---- Q32 (envelope form): the repeated-group shape real audit files
    //      have — one <Audit> document per customer carrying one
    //      <AuditRecord> per order — parsed with from_xml against
    //      AuditModel.auditDocSchema (ArrayType(StructType)), exploded,
    //      and projected onto the FULL §1.2 field set (Sql_Bind is
    //      omitted from the XML to exercise the missing-element → NULL
    //      path). The oracle restates the construction algebraically, so
    //      any drift in the array parse, the explode, or a field's type
    //      mapping hash-mismatches.
    "q87_xml_envelope" -> Q(
      (s, d) => {
        val rec = format_string(
          "<AuditRecord><Audit_Type>1</Audit_Type><Session_Id>%d</Session_Id>" +
            "<StatementId>%d</StatementId><EntryId>%d</EntryId>" +
            "<Extended_Timestamp>%s</Extended_Timestamp><DB_User>u%d</DB_User>" +
            "<OS_User>os%d</OS_User><Userhost>host%d</Userhost>" +
            "<OS_Process>%d</OS_Process><Instance_Number>%d</Instance_Number>" +
            "<Action>%d</Action><Returncode>%d</Returncode><Scn>%d</Scn>" +
            "<Object_Schema>S%d</Object_Schema><Object_Name>T%d</Object_Name>" +
            "<Sql_Text>select %d</Sql_Text></AuditRecord>",
          col("o_orderkey"), col("o_custkey"), pmod(col("o_orderkey"), lit(100)),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"),
          col("o_custkey"), col("o_custkey"), pmod(col("o_custkey"), lit(10)),
          col("o_orderkey"), pmod(col("o_custkey"), lit(4)),
          pmod(col("o_orderkey"), lit(100)), pmod(col("o_orderkey"), lit(7)),
          col("o_orderkey") * 1000, pmod(col("o_custkey"), lit(5)),
          pmod(col("o_orderkey"), lit(20)), col("o_orderkey"))
        val docs = Tables(s, d, "orders")
          .withColumn("rec_xml", rec)
          .groupBy(col("o_custkey"))
          .agg(expr("array_join(transform(array_sort(collect_list(" +
            "struct(o_orderkey, rec_xml))), r -> r.rec_xml), '')").as("body"))
          .select(col("o_custkey"),
            concat(lit("<Audit>"), col("body"), lit("</Audit>")).as("payload"))
        graft.ingest.AuditModel.parseAuditXml(docs, "payload")
          .select(col("o_custkey").as("src_cust"),
            col("rec.Audit_Type").as("audit_type"),
            col("rec.Session_Id").as("session_id"),
            col("rec.StatementId").as("statement_id"),
            col("rec.EntryId").as("entry_id"),
            col("rec.Extended_Timestamp").as("ext_ts"),
            col("rec.DB_User").as("db_user"),
            col("rec.OS_User").as("os_user"),
            col("rec.Userhost").as("userhost"),
            col("rec.OS_Process").as("os_process"),
            col("rec.Instance_Number").as("instance_number"),
            col("rec.Action").as("action"),
            col("rec.Returncode").as("returncode"),
            col("rec.Scn").as("scn"),
            col("rec.Object_Schema").as("object_schema"),
            col("rec.Object_Name").as("object_name"),
            col("rec.Sql_Text").as("sql_text"),
            col("rec.Sql_Bind").as("sql_bind"))
      },
      Some("""SELECT o_custkey AS src_cust,
             |  CAST(1 AS INT) AS audit_type,
             |  o_orderkey AS session_id,
             |  o_custkey AS statement_id,
             |  o_orderkey % 100 AS entry_id,
             |  date_trunc('second', o_orderdate) AS ext_ts,
             |  'u' || o_custkey AS db_user,
             |  'os' || o_custkey AS os_user,
             |  'host' || (o_custkey % 10) AS userhost,
             |  CAST(o_orderkey AS VARCHAR) AS os_process,
             |  CAST(o_custkey % 4 AS INT) AS instance_number,
             |  CAST(o_orderkey % 100 AS INT) AS action,
             |  CAST(o_orderkey % 7 AS INT) AS returncode,
             |  o_orderkey * 1000 AS scn,
             |  'S' || (o_custkey % 5) AS object_schema,
             |  'T' || (o_orderkey % 20) AS object_name,
             |  'select ' || o_orderkey AS sql_text,
             |  CAST(NULL AS VARCHAR) AS sql_bind
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
