package graft

import graft.functions.ParityFns
import graft.functions.TextKernels
import org.apache.spark.sql.functions._

/** Native shingle/minhash kernels vs the HOF formulation: identical
  * output on the fixture corpus (order included — both are
  * first-occurrence distinct), identical hashes, identical signatures.
  */
class TextKernelSpec extends SparkSuite {

  test("native shingles3 equals the HOF formulation, order included") {
    import spark.implicits._
    val diff = Tables(spark, sf(), "documents")
      .select(
        call_function("graft_shingles3", col("text")).as("native"),
        ParityFns.shingles3(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("native hashModP equals conv(substring(md5,1,15),16,10) % P") {
    import spark.implicits._
    val texts = Seq("alpha beta gamma", "x", "", "the quick brown fox")
    val fromCol = texts.toDF("t")
      .select(ParityFns.hashModP(col("t")).as("h")).as[Long].collect()
    val fromKernel = texts.map(t =>
      TextKernels.hashModP(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    assert(fromCol.toSeq == fromKernel)
  }

  test("native hash60 equals conv(substring(md5,1,15),16,10) on the corpus") {
    val diff = Tables(spark, sf(), "documents")
      .select(explode(ParityFns.shingles3(col("text"))).as("s"))
      .select(
        call_function("graft_hash60", col("s")).as("native"),
        ParityFns.hash60(col("s")).as("column"))
      .filter(col("native") =!= col("column"))
    assert(diff.count() == 0)
  }

  test("native minhash signature equals the 32-aggregate HOF fold") {
    import spark.implicits._
    val base = Tables(spark, sf(), "documents")
      .select(col("doc_id"), ParityFns.shingles3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val hv = base.withColumn("hv", transform(col("sh"), x => ParityFns.hashModP(x)))
    val hof = hv.withColumn("sig", array(TextKernels.seeds.map { case (a, b) =>
      aggregate(col("hv"), lit(ParityFns.P),
        (acc, h) => least(acc, (lit(a) * h + lit(b)) % lit(ParityFns.P)))
    }: _*))
    val diff = hof
      .withColumn("native", call_function("graft_minhash", col("sh")))
      .filter(col("native") =!= col("sig"))
    assert(diff.count() == 0)
  }

  test("native simhash equals the relational (token/bit group-by) formulation") {
    import spark.implicits._
    val docs = Tables(spark, sf(), "documents")
    val native = docs.select(col("doc_id"),
        call_function("graft_simhash", col("text")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val tc = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
    val th = tc.withColumn("h", ParityFns.hash32(col("w")))
    val relational = th
      .select(col("doc_id"), col("h"), col("cnt"),
        explode(sequence(lit(0), lit(31))).as("j"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(when(expr("(shiftright(h, j) & 1) = 1"), col("cnt"))
        .otherwise(-col("cnt"))).as("sm"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("sm") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
        .otherwise(lit(0L))).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(native == relational)
  }

  test("empty and short texts yield empty shingle arrays") {
    val r = spark.sql(
      "SELECT size(graft_shingles3('a b')) AS s1, size(graft_shingles3('')) AS s2").head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 0)
  }
}
