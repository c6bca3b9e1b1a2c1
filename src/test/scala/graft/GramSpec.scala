package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** graft_gram kernel contract: bit-exact parity with the declarative
  * explode formulation, partitioning invariance (the property exact
  * integer arithmetic buys), null/empty behavior, and the loud ragged-
  * input failure.
  */
class GramSpec extends SparkSuite {
  import spark.implicits._

  private def vecs(rows: Seq[Array[Long]], parts: Int) =
    spark.createDataset(rows.map(_.toSeq)).repartition(parts).toDF("v")
      .select(col("v").cast("array<bigint>").as("v"))

  private def kernel(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(call_function("graft_gram", col("v")).as("g"))
      .head.getSeq[Long](0).toArray

  private def reference(rows: Seq[Array[Long]]): Array[Long] = {
    val d = rows.head.length
    val tri = new Array[Long](d * (d + 1) / 2)
    rows.foreach { v =>
      var idx = 0
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { tri(idx) += v(i) * v(j); idx += 1; j += 1 }
        i += 1
      }
    }
    tri
  }

  test("kernel matches the sequential reference and is partitioning-invariant") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(97)(Array.fill(5L.toInt)(rng.nextInt(2001) - 1000L))
    val want = reference(rows)
    assert(kernel(vecs(rows, 1)).sameElements(want))
    assert(kernel(vecs(rows, 7)).sameElements(want))
  }

  test("kernel matches the q200 declarative explode fallback on fixture data") {
    val q = Tables(spark, sf(), "embeddings").select(expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 65536.0D) AS BIGINT))")
      .as("v"))
    val viaKernel = kernel(q)
    val viaExplode = q.select(posexplode(expr(
      "flatten(transform(sequence(0, size(v) - 1), " +
        "i -> transform(sequence(i, size(v) - 1), j -> v[i] * v[j])))"))
      .as(Seq("idx", "p")))
      .groupBy(col("idx")).agg(sum(col("p")).as("s"))
      .orderBy(col("idx"))
      .collect().map(_.getLong(1))
    assert(viaKernel.sameElements(viaExplode))
  }

  test("null vectors are skipped; all-null input yields an empty triangle") {
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq(1L, 2L)), Row(null), Row(Seq(3L, 4L)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType), nullable = true))))
    assert(kernel(withNull).sameElements(
      reference(Seq(Array(1L, 2L), Array(3L, 4L)))))
    val allNull = withNull.filter(col("v").isNull)
    assert(kernel(allNull).isEmpty)
  }

  test("ragged dimensions fail loudly, never mis-accumulate") {
    val ragged = vecs(Seq(Array(1L, 2L), Array(1L, 2L, 3L)), 1)
    val e = intercept[Exception] {
      ragged.agg(call_function("graft_gram", col("v"))).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }
}
