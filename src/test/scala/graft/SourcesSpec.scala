package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth (SURVEY.md §2.2 Q1/Q2/Q5): the engine
  * round-trips its frames through every bundled columnar/text format
  * with schema and values intact.
  */
class SourcesSpec extends SparkSuite {

  private lazy val docs = Tables(spark, sf(), "documents")
    .select(col("doc_id"), col("lang"), col("text")).limit(50).cache()

  private def roundTrip(fmt: String, opts: Map[String, String] = Map.empty): Unit = {
    val dir = tmpDir(s"rt_$fmt").resolve("data").toString
    docs.write.options(opts).format(fmt).save(dir)
    val back = spark.read.options(opts)
      .schema(docs.schema) // csv/json need the schema to round-trip types
      .format(fmt).load(dir)
    assert(back.count() == 50)
    val orig = docs.collect().map(_.toSeq).toSet
    val got = back.collect().map(_.toSeq).toSet
    assert(got == orig, s"$fmt round-trip diverged")
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("orc round-trip")(roundTrip("orc"))
  test("json round-trip")(roundTrip("json"))
  test("csv round-trip")(
    roundTrip("csv", Map("header" -> "true", "escape" -> "\"", "multiLine" -> "true")))

  test("registerViews: the whole engine is drivable from plain SQL") {
    Tables.registerViews(spark, sf())
    // relational surface over the views...
    val j = spark.sql(
      """SELECT o_orderstatus, count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin).collect()
    assert(j.nonEmpty && j.map(_.getLong(1)).sum > 0)
    // ...composed with the injected graft_* kernels in the same statement
    val d = spark.sql(
      """SELECT count(DISTINCT graft_simhash(text)) AS n_prints,
        |  max(size(graft_minhash(graft_shingles3(text)))) AS sig_len
        |FROM documents""".stripMargin).head()
    assert(d.getLong(0) > 0 && d.getInt(1) == 32)
    // the events view carries the normalized NANOS→micros timestamp
    assert(spark.sql("SELECT min(ts) FROM events").head().get(0) != null)
  }

  test("binaryFile + text sources read whole files") {
    val dir = tmpDir("files")
    java.nio.file.Files.writeString(dir.resolve("a.xml"), "line1\nline2")
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xml").load(dir.toString)
    assert(bin.count() == 1)
    assert(new String(bin.head().getAs[Array[Byte]]("content"), "UTF-8") == "line1\nline2")
    val txt = spark.read.format("text").option("wholetext", "true").load(dir.toString)
    assert(txt.head().getString(0) == "line1\nline2")
  }
}
