package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The audit-event data model: envelope columns shared by the batch and
  * streaming ingest paths, the §1.2 parsed-record schema, and the scalar
  * operators R4 (pid parse), R6 (newline strip), R7 (completeness), R8
  * (message key).
  */
object AuditModel {

  /** Parsed Oracle XML audit record — SURVEY.md §1.2. One `<Audit>`
    * document carries an array of `<AuditRecord>` elements.
    */
  val auditRecordSchema: StructType = StructType(Seq(
    StructField("Audit_Type", IntegerType),
    StructField("Session_Id", LongType),
    StructField("StatementId", LongType),
    StructField("EntryId", LongType),
    StructField("Extended_Timestamp", TimestampType),
    StructField("DB_User", StringType),
    StructField("OS_User", StringType),
    StructField("Userhost", StringType),
    StructField("OS_Process", StringType),
    StructField("Instance_Number", IntegerType),
    StructField("Action", IntegerType),
    StructField("Returncode", IntegerType),
    StructField("Scn", LongType),
    StructField("Object_Schema", StringType),
    StructField("Object_Name", StringType),
    StructField("Sql_Text", StringType),
    StructField("Sql_Bind", StringType)))

  /** `<Audit>` document schema for from_xml: repeated AuditRecord. */
  val auditDocSchema: StructType = StructType(Seq(
    StructField("AuditRecord", ArrayType(auditRecordSchema))))

  /** R4: Oracle server-process PID from the audit file name — the token
    * before the last `_` (file convention `<instance>_ora_<pid>_<seq>.xml`).
    * Reference algorithm: OraTrcNameHolder.java:34-35 (substring between
    * the last separator and the last `_`, then after its last `_`).
    * No-match → NULL (the reference swallows the parse error and logs).
    */
  def pidFromPath(path: Column): Column =
    nullif(regexp_extract(path, "_([^_/]+)_[^_/]*$", 1), lit(""))

  /** Scala port of the exact reference substring algorithm, used by the
    * property spec to cross-check the regex above on generated names.
    */
  def referencePidParse(fileName: String): Option[String] = {
    // OraTrcNameHolder.java:34-35, with File.separator = "/"
    try {
      val trimmed = fileName.substring(
        fileName.lastIndexOf("/") + 1, fileName.lastIndexOf("_"))
      val pid = trimmed.substring(trimmed.lastIndexOf("_") + 1)
      if (pid.isEmpty) None else Some(pid)
    } catch { case _: StringIndexOutOfBoundsException => None }
  }

  /** R6: the reference reads line-by-line and concatenates WITHOUT the
    * newline (KafkaJob.java:52-55, the commented-out `append("\n")`), so
    * the shipped value is the file with all line breaks removed.
    */
  def stripNewlines(payload: Column): Column =
    regexp_replace(payload, "\\r?\\n", "")

  /** R7: completeness predicate — Oracle has finished writing iff the
    * trimmed payload ends with the audit-trail root terminator
    * (KafkaJob.java:59).
    */
  def isComplete(payload: Column): Column =
    rtrim(payload).endsWith("</Audit>")

  /** R8: message key `host:path` (KafkaJob.java:47). */
  def messageKey(host: String, path: Column): Column =
    concat_ws(":", lit(host), path)

  /** Shared envelope transform: expects `payload`, `path`, `mtime`,
    * `length` columns; emits the (key, value) Kafka-sink frame plus
    * lineage columns.
    */
  def envelope(df: DataFrame, host: String): DataFrame =
    df.select(
      messageKey(host, col("path")).as("key"),
      stripNewlines(col("payload")).as("value"),
      col("path").as("src_file"),
      pidFromPath(col("path")).as("src_pid"),
      col("mtime").as("src_mtime"),
      col("length").as("src_bytes"),
      current_timestamp().as("ingest_ts"))
      .withColumn("complete", isComplete(col("value")))

  /** Q32 payload analytics: parse the raw XML into §1.2 rows, one row per
    * AuditRecord (explode of the repeated group).
    */
  def parseAuditXml(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("__doc", from_xml(col(payloadCol), auditDocSchema))
      .withColumn("rec", explode(col("__doc.AuditRecord")))
      .drop("__doc")
}
