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

  test("q214: every correlation cell matches a scalar recount; diagonal is 1") {
    val rows = Tables(spark, sf(), "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 256.0).toLong).toArray)
    val n = rows.length.toLong
    val d = rows.head.length
    val got = graft.queries.Catalog.all("q214_feature_corr")
      .build(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))).toMap
    assert(got.size == d * (d + 1) / 2)
    // spot-check a band of cells plus the full diagonal against plain
    // scalar sums (the full 2080-cell recount is the oracle's job)
    val checks = (0 until d).map(k => (k, k)) ++
      Seq((0, 1), (0, 63), (7, 12), (31, 32), (12, 55))
    checks.foreach { case (i, j) =>
      var sxy = 0L; var sx = 0L; var sy = 0L; var sxx = 0L; var syy = 0L
      rows.foreach { v =>
        sxy += v(i) * v(j); sx += v(i); sy += v(j)
        sxx += v(i) * v(i); syy += v(j) * v(j)
      }
      val covN2 = n * sxy - sx * sy
      assert(got((i, j))._1 == covN2, s"cov($i,$j)")
      val vx = (n * sxx - sx * sx).toDouble
      val vy = (n * syy - sy * sy).toDouble
      if (vx > 0 && vy > 0) {
        val corr = covN2.toDouble / (math.sqrt(vx) * math.sqrt(vy))
        assert(math.abs(got((i, j))._2.get - corr) < 1e-12, s"corr($i,$j)")
        // sqrt(vx)·sqrt(vx) can be 1 ulp off vx, so the diagonal is 1
        // only to ulp precision — never assert exact equality on it
        if (i == j)
          assert(math.abs(got((i, j))._2.get - 1.0) < 1e-12,
            s"diagonal corr($i,$i) must be ~1")
      }
    }
  }

  test("q212 integer direction aligns with a double-precision eigenvector") {
    // correctness beyond oracle-determinism: q212's fixed-point power
    // iteration must actually find the dominant direction. Reference:
    // 200 rounds of ordinary double power iteration on the exact
    // integer Gram built from the SAME 2^8 quantization.
    val rows = Tables(spark, sf(), "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 256.0).toLong).toArray)
    val d = rows.head.length
    val g = Array.ofDim[Double](d, d)
    rows.foreach { v =>
      for (i <- 0 until d; j <- 0 until d) g(i)(j) += v(i).toDouble * v(j)
    }
    var ref = Array.fill(d)(1.0)
    for (_ <- 1 to 200) {
      val u = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * ref(j)).sum)
      val n = math.sqrt(u.map(x => x * x).sum)
      ref = u.map(_ / n)
    }
    // check the entry's OUTPUT, not its internals: the emitted per-vec
    // projections must be proportional to the reference projections —
    // cosine over the projection vector, sign-insensitive (eigenvector
    // sign is arbitrary)
    val got = graft.queries.Catalog.all("q212_dominant_direction")
      .build(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble).sortBy(_._1).map(_._2)
    val vecsById = Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 256.0)).toArray)
      .sortBy(_._1).map(_._2)
    val refProj = vecsById.map(v => v.zip(ref).map { case (a, b) => a * b }.sum)
    val dot = got.zip(refProj).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) / (math.sqrt(got.map(x => x * x).sum)
      * math.sqrt(refProj.map(x => x * x).sum))
    assert(cos > 0.99, s"projection cosine vs double eigenvector: $cos")
  }

  test("q212 Gram rescale engages on large-magnitude vectors and stays correct") {
    import spark.implicits._
    // round-13 verdict item 4: without the k0 rescale, gram entries
    // past 2^42 overflow the first mat-vec (entry × 2^20 × 64 > 2^63)
    // and the direction comes out as wrap-around garbage. Planted
    // ~1e6-magnitude vectors put the triangle's max near 2^57 — deep
    // inside the rescale regime — and the output must STILL align
    // with a double-precision eigenvector of the same quantized Gram.
    val d = 64
    val w = Array.tabulate(d)(i => ((i % 5) + 1) * 2.0e5)
    val z = Array.tabulate(d)(i => (((i * 3) % 7) - 3) * 1.2e4)
    val rows = (0 until 10).map { k =>
      val a = 1.0 - 0.15 * (k % 4)
      val b = if (k % 2 == 0) 0.4 else -0.3
      (k.toLong, Array.tabulate(d)(i => (a * w(i) + b * z(i)).toFloat).toSeq)
    }
    val dir = tmpDir("q212_bigmag").toString
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")

    val quant = rows.map(_._2.map(x => math.floor(x.toDouble * 256.0).toLong).toArray)
    // precondition: the planted triangle is in the rescale regime —
    // compute the exact max |summed triangle entry| over the Gram
    var maxAbs = 0L
    for (i <- 0 until d; j <- i until d) {
      maxAbs = math.max(maxAbs, math.abs(
        quant.map(u => u(i) * u(j)).sum))
    }
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(maxAbs)
    assert(bitlen > 42, s"fixture must force the rescale (bitlen $bitlen)")

    val got = graft.queries.Catalog.all("q212_dominant_direction")
      .build(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble).sortBy(_._1).map(_._2)
    assert(got.length == rows.length && got.exists(_ != 0.0),
      s"projections must be non-degenerate: ${got.toSeq}")

    // double-precision reference eigenvector of the same quantized Gram
    val g = Array.ofDim[Double](d, d)
    quant.foreach { v =>
      for (i <- 0 until d; j <- 0 until d) g(i)(j) += v(i).toDouble * v(j)
    }
    var ref = Array.fill(d)(1.0)
    for (_ <- 1 to 200) {
      val u = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * ref(j)).sum)
      val n = math.sqrt(u.map(x => x * x).sum)
      ref = u.map(_ / n)
    }
    val refProj = quant.map(v =>
      v.zip(ref).map { case (a, b) => a.toDouble * b }.sum)
    val dot = got.zip(refProj).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) / (math.sqrt(got.map(x => x * x).sum)
      * math.sqrt(refProj.map(x => x * x).sum))
    assert(cos > 0.99, s"rescaled projection cosine vs eigenvector: $cos")
  }

  test("q225 residuals replay the shared IEEE DAG from the exact moments") {
    val got = graft.queries.Catalog.all("q225_residual_norms")
      .build(spark, sf()).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (norm2, proj, vv) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // replay the ResidDerived op order exactly: division FIRST
      val resid2 = norm2.toDouble - (proj.toDouble / vv.toDouble) * proj.toDouble
      assert(r.getDouble(4) == resid2, s"resid2 bit-replay: $r")
      assert(r.getDouble(5) == math.sqrt(math.max(resid2, 0.0)),
        s"resid_norm bit-replay: $r")
      // geometry: removed energy never exceeds the vector's energy
      assert(resid2 <= norm2.toDouble + 1e-6 * norm2.toDouble, s"resid2 > norm2: $r")
    }
    // the removal must be non-trivial on the fixture: some energy goes,
    // some stays (neither all-parallel nor direction-orthogonal corpus)
    val fracs = got.map(r =>
      r.getDouble(5) / math.sqrt(math.max(r.getLong(1).toDouble, 1.0)))
    assert(fracs.min < 0.95 && fracs.max > 0.05, s"degenerate removal: " +
      s"min=${fracs.min} max=${fracs.max}")
  }

  test("q225: exactly-parallel vectors lose all energy, mixed vectors keep theirs") {
    import spark.implicits._
    // planted corpus: six exact multiples of one base direction (their
    // quantized vectors are exact integer multiples, so the dominant
    // direction IS the base and their residual is ~0) plus two rows
    // with a strong off-direction component that must survive removal
    val d = 64
    val w = Array.tabulate(d)(i => ((i % 7) + 1) * 100.0)
    // z exactly orthogonal to w (pairwise rotation: (w2m+1, -w2m)) and
    // planted as w+z AND w-z, so the ŵẑ cross term of the Gram cancels
    // and the dominant direction is exactly ŵ — parallel rows then owe
    // residual only to quantization
    val z = Array.tabulate(d)(i =>
      if (i % 2 == 0) w(i + 1) else -w(i - 1))
    val rows = Seq(1.0, 0.5, -0.75, 0.25, 1.25, -0.5).zipWithIndex.map {
      case (a, k) => (k.toLong, w.map(x => (a * x).toFloat).toSeq)
    } ++ Seq(
      (6L, w.zip(z).map { case (a, b) => (a + b).toFloat }.toSeq),
      (7L, w.zip(z).map { case (a, b) => (a - b).toFloat }.toSeq))
    val dir = tmpDir("q225_parallel").toString
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = graft.queries.Catalog.all("q225_residual_norms")
      .build(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(5) / math.sqrt(r.getLong(1).toDouble))).toMap
    (0L to 5L).foreach(k =>
      assert(got(k) < 0.05, s"parallel row $k keeps energy: ${got(k)}"))
    Seq(6L, 7L).foreach(k =>
      assert(got(k) > 0.1, s"mixed row $k lost its off-component: ${got(k)}"))
  }
}
