package graft

import org.apache.spark.sql.functions._

/** Misra–Gries sketch aggregate: the frequency guarantee (any token
  * with freq > N/(capacity+1) survives), SQL usability, and the
  * sketch-then-verify query matching exact top-k.
  */
class MisraGriesSpec extends SparkSuite {

  test("MG guarantee: heavy items survive a tiny capacity on skewed data") {
    import spark.implicits._
    // 1000 rows: "hot" 400×, "warm" 300×, 300 distinct cold singletons
    val data = Seq.fill(400)("hot") ++ Seq.fill(300)("warm") ++
      (1 to 300).map(i => s"cold_$i")
    val cand = data.toDF("t").repartition(7) // exercise partial merges
      .agg(call_function("graft_mg_candidates", col("t"), lit(4)).as("c"))
      .select(explode(col("c")).as("t")).as[String].collect().toSet
    // freq > 1000/5 = 200 ⇒ hot and warm are guaranteed present
    assert(cand.contains("hot") && cand.contains("warm"))
    assert(cand.size <= 4)
  }

  test("sketch is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_mg_candidates(t, 8) AS c FROM VALUES ('a'),('a'),('b') AS v(t)")
      .head().getSeq[String](0)
    assert(r.toSet == Set("a", "b"))
  }

  test("candidates cover exact top-10 on the fixture corpus (MG precondition)") {
    import spark.implicits._
    // q65's oracle-equality is only sound if the MG(4096) candidate set
    // is a superset of the exact top-10, i.e. every top-10 token clears
    // the N/(capacity+1) frequency bar on this corpus. Verify both the
    // superset and the bar directly.
    val toks = Tables(spark, sf(), "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val top10 = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bar = n.toDouble / 4097
    assert(top10.forall(_._2 > bar),
      s"top-10 min freq ${top10.map(_._2).min} must exceed N/(c+1) = $bar")
    val cand = toks
      .agg(call_function("graft_mg_candidates", col("token"), lit(4096)).as("c"))
      .select(explode(col("c")).as("t")).as[String].collect().toSet
    assert(top10.map(_._1).forall(cand.contains),
      s"candidates must cover the exact top-10; missing: ${top10.map(_._1).filterNot(cand.contains).mkString(",")}")
  }

  test("sketch-then-verify equals exact top-10 on the fixture corpus") {
    val viaSketch = graft.queries.Catalog.all("q65_heavy_hitters")
      .build(spark, sf()).collect().map(_.toSeq).toSeq
    val exact = Tables(spark, sf(), "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token").asc).limit(10)
      .collect().map(_.toSeq).toSeq
    assert(viaSketch == exact)
  }
}
