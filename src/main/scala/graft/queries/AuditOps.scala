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

  /** Oracle AUD$ `ses_actions` position map (SURVEY §1.2 declares the
    * 16-char column; the position→action assignment is Oracle's
    * documented session-audit layout): positions 1–13 carry ALTER …
    * EXECUTE, 14–16 are reserved. Single source of truth for q89's
    * decoder AND its oracle SQL (generated from this list), so the two
    * cannot drift.
    */
  val SesActionNames: Seq[String] = Seq("ALTER", "AUDIT", "COMMENT",
    "DELETE", "GRANT", "INDEX", "INSERT", "LOCK", "RENAME", "SELECT",
    "UPDATE", "REFERENCES", "EXECUTE")

  /** The q87 envelope pipeline, shared with the q88/q133 audit reports:
    * construct one <Audit> document per customer (one <AuditRecord> per
    * order, deterministic fields), parse with from_xml against the §1.2
    * schema, explode to record grain. The reports query THROUGH the
    * parse, so a parse regression breaks their hashes too — and at
    * 100 TB the parse is scan-stage work feeding low-cardinality
    * hash-aggregates (user/object/host grain), never a wide shuffle.
    */
  private def parsedEnvelope(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
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
  }

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
      (s, d) => parsedEnvelope(s, d),
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

    // ---- Audit report 1 (the reference's own use case — FGA policies /
    //      AUDIT SELECT in /root/reference/README.md:176-193 exist to
    //      answer exactly this): which user failed which action on which
    //      object. Filters returncode != 0 THROUGH the q87 parse path
    //      and rolls up at (user, object) grain — scan-stage parse, a
    //      low-cardinality hash-agg, nothing corpus-wide shuffles.
    "q88_failed_actions" -> Q(
      (s, d) => parsedEnvelope(s, d)
        .filter(col("returncode") =!= 0)
        .groupBy(col("db_user"), col("object_schema"), col("object_name"))
        .agg(count(lit(1)).as("n_fail"),
          countDistinct(col("session_id")).as("n_sessions"),
          countDistinct(col("returncode")).as("n_codes"),
          max(col("ext_ts")).as("last_fail_ts")),
      Some("""SELECT 'u' || o_custkey AS db_user,
             |  'S' || (o_custkey % 5) AS object_schema,
             |  'T' || (o_orderkey % 20) AS object_name,
             |  CAST(count(*) AS BIGINT) AS n_fail,
             |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_sessions,
             |  CAST(count(DISTINCT o_orderkey % 7) AS BIGINT) AS n_codes,
             |  max(date_trunc('second', o_orderdate)) AS last_fail_ts
             |FROM orders WHERE o_orderkey % 7 <> 0
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ---- Audit report 2: decode the 16-char AUD$ ses_actions session
    //      mask (SURVEY §1.2) into (position, action, audit-when) rows.
    //      The mask is synthesized deterministically per customer (bit i
    //      of c_custkey arms position i; (c_custkey+i) mod 3 picks
    //      Success/Failure/Both), then the DECODER under test splits,
    //      explodes, filters the unarmed positions, and names each
    //      action from [[SesActionNames]] — the oracle rebuilds mask and
    //      decode from the same list, so the position map cannot drift.
    //      Per-row explode of a 16-char string: scan-stage, no shuffle.
    "q89_ses_actions" -> Q(
      (s, d) => {
        val whenChars = Seq("S", "F", "B")
        val maskCols = (1 to 16).map { i =>
          if (i > SesActionNames.size) lit("-")
          else when(pmod(shiftright(col("c_custkey"), i - 1), lit(2)) === 1,
            element_at(typedLit(whenChars),
              (pmod(col("c_custkey") + lit(i), lit(3)) + 1).cast("int")))
            .otherwise(lit("-"))
        }
        Tables(s, d, "customer")
          .select(col("c_custkey"), concat(maskCols: _*).as("ses_actions"))
          .select(col("c_custkey"), col("ses_actions"),
            posexplode(split(col("ses_actions"), "")).as(Seq("pos", "ch")))
          .filter(col("ch") =!= "-")
          .select(col("c_custkey"), col("ses_actions"),
            (col("pos") + 1).cast("int").as("position"),
            element_at(typedLit(SesActionNames),
              (col("pos") + 1).cast("int")).as("action"),
            when(col("ch") === "S", lit("SUCCESS"))
              .when(col("ch") === "F", lit("FAILURE"))
              .otherwise(lit("BOTH")).as("audit_when"))
      },
      Some {
        val maskSql = (1 to 16).map { i =>
          if (i > SesActionNames.size) "'-'"
          else s"""CASE WHEN ((c_custkey >> ${i - 1}) & 1) = 1
                  | THEN (CASE (c_custkey + $i) % 3
                  |       WHEN 0 THEN 'S' WHEN 1 THEN 'F' ELSE 'B' END)
                  | ELSE '-' END""".stripMargin.replaceAll("\n", "")
        }.mkString(" || ")
        val nameCase = SesActionNames.zipWithIndex
          .map { case (n, idx) => s"WHEN ${idx + 1} THEN '$n'" }.mkString(" ")
        s"""WITH m AS (SELECT c_custkey, $maskSql AS ses_actions FROM customer),
           |d AS (SELECT c_custkey, ses_actions, i, substr(ses_actions, i, 1) AS ch
           |      FROM m, LATERAL (SELECT unnest(generate_series(1, 16)) AS i) l)
           |SELECT c_custkey, ses_actions, CAST(i AS INT) AS position,
           |  CASE i $nameCase END AS action,
           |  CASE ch WHEN 'S' THEN 'SUCCESS' WHEN 'F' THEN 'FAILURE'
           |       ELSE 'BOTH' END AS audit_when
           |FROM d WHERE ch <> '-'""".stripMargin
      }),

    // ---- Audit report 3: per-login activity rollup — who did how much,
    //      from where, with what failure rate. (db_user, userhost)
    //      grain through the q87 parse: session/action/object counts,
    //      first/last activity, failure fraction. Object identity uses
    //      schema||'.'||name concat in BOTH engines (a two-column
    //      DISTINCT would hinge on engine row-hash internals).
    "q133_session_rollup" -> Q(
      (s, d) => parsedEnvelope(s, d)
        .groupBy(col("db_user"), col("userhost"))
        .agg(countDistinct(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_actions"),
          count_if(col("returncode") =!= 0).as("n_failed"),
          countDistinct(concat_ws(".", col("object_schema"),
            col("object_name"))).as("n_objects"),
          min(col("ext_ts")).as("first_ts"),
          max(col("ext_ts")).as("last_ts"))
        .withColumn("fail_frac",
          col("n_failed").cast("double") / col("n_actions").cast("double")),
      Some("""SELECT 'u' || o_custkey AS db_user,
             |  'host' || (o_custkey % 10) AS userhost,
             |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_sessions,
             |  CAST(count(*) AS BIGINT) AS n_actions,
             |  CAST(count(*) FILTER (o_orderkey % 7 <> 0) AS BIGINT) AS n_failed,
             |  CAST(count(DISTINCT 'S' || (o_custkey % 5) || '.' ||
             |    'T' || (o_orderkey % 20)) AS BIGINT) AS n_objects,
             |  min(date_trunc('second', o_orderdate)) AS first_ts,
             |  max(date_trunc('second', o_orderdate)) AS last_ts,
             |  CAST(count(*) FILTER (o_orderkey % 7 <> 0) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) AS fail_frac
             |FROM orders
             |GROUP BY 1, 2""".stripMargin)),

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
