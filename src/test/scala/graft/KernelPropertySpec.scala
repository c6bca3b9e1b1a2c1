package graft

import graft.functions.{ParityFns, TextKernels}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based parity: the native kernels must equal their column/HOF
  * formulations on ADVERSARIAL inputs the fixture corpus never produces —
  * unicode, repeated/leading/trailing spaces, empty tokens, huge tokens.
  * Any divergence here would surface as an oracle hash-mismatch only on
  * some future corpus; catch it now.
  */
class KernelPropertySpec extends SparkSuite {

  /** Deterministic sampling (no scalatest-scalacheck bridge offline):
    * fixed seeds make every run identical, so a failure is reproducible
    * by seed index.
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(0xC0FFEEL + i)))

  // words over a deliberately nasty alphabet (ascii, accents, CJK, emoji,
  // empty word = consecutive spaces when joined)
  private val word: Gen[String] =
    Gen.frequency(
      6 -> Gen.stringOfN(3, Gen.alphaNumChar),
      2 -> Gen.oneOf("é", "ß", "日本語", "🦀", "ωμέγα", "a-b_c"),
      1 -> Gen.const(""),
      1 -> Gen.stringOfN(64, Gen.alphaNumChar))
  private val text: Gen[String] = Gen.chooseNum(0, 12)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def viaSpark(texts: Seq[String], col1: org.apache.spark.sql.Column): Seq[Any] = {
    import spark.implicits._
    texts.toDF("t").select(col1.as("v")).collect().map(_.get(0)).toSeq
  }

  test("hash60 kernel == conv(substring(md5,1,15),16,10) for arbitrary strings") {
    val texts = samples(text, 200)
    val kernel = texts.map(t => TextKernels.hash60(UTF8String.fromString(t)))
    assert(viaSpark(texts, ParityFns.hash60(col("t"))) == kernel)
  }

  test("hashModP kernel == column formulation for arbitrary strings") {
    val texts = samples(text, 200)
    val kernel = texts.map(t => TextKernels.hashModP(UTF8String.fromString(t)))
    assert(viaSpark(texts, ParityFns.hashModP(col("t"))) == kernel)
  }

  test("shingles3 kernel == HOF formulation for arbitrary strings") {
    val texts = samples(text, 200)
    val native = viaSpark(texts, call_function("graft_shingles3", col("t")))
    val hof = viaSpark(texts, ParityFns.shingles3(col("t")))
    assert(native == hof)
  }

  test("shinglesK kernel == array_distinct(HOF) for arbitrary strings, k=1..7") {
    val texts = samples(text, 120)
    (1 to 7).foreach { k =>
      val native = viaSpark(texts,
        call_function("graft_shingles", col("t"), lit(k)))
      val toks = split(col("t"), " ")
      val hof = viaSpark(texts,
        when(size(toks) >= k,
          array_distinct(transform(sequence(lit(1), size(toks) - (k - 1)),
            i => concat_ws(" ", slice(toks, i, lit(k))))))
          .otherwise(typedLit(Seq.empty[String])))
      assert(native == hof, s"shinglesK diverges at k=$k")
    }
  }

  test("simhash kernel == relational formulation for arbitrary strings") {
    // relational mirror in-memory: token counts → bit sums → sign bits,
    // using the same hash32; avoids a per-case Spark job for speed
    def relational(t: String): Long = {
      val counts = t.split(" ", -1).groupBy(identity).view.mapValues(_.length.toLong)
      val acc = new Array[Long](32)
      counts.foreach { case (w, c) =>
        val h = TextKernels.hash32(UTF8String.fromString(w))
        (0 until 32).foreach(j => if (((h >> j) & 1L) == 1L) acc(j) += c else acc(j) -= c)
      }
      (0 until 32).foldLeft(0L)((v, j) => if (acc(j) > 0) v | (1L << j) else v)
    }
    samples(text, 300).foreach { t =>
      assert(TextKernels.simhash(UTF8String.fromString(t)) == relational(t), s"text: '$t'")
    }
  }

  test("minhash kernel == 32-fold of hashModP for arbitrary shingle sets") {
    samples(Gen.listOfN(8, word), 150).foreach { words =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        words.map(w => UTF8String.fromString(w)).toArray[Any])
      val sig = TextKernels.minhashSig(arr)
      val expected = TextKernels.seeds.map { case (a, b) =>
        words.map(w => TextKernels.hashModP(UTF8String.fromString(w)))
          .foldLeft(TextKernels.P)((acc, h) => math.min(acc, (a * h + b) % TextKernels.P))
      }
      assert((0 until 32).forall(j => sig.getLong(j) == expected(j)), s"words: $words")
    }
  }

  /** q45's exactness claim is DOUBLE pigeonhole: ≤ 3 flipped bits miss a
    * whole byte, and within that byte's 24-bit complement miss one of
    * its four 6-bit chunks, so every ham ≤ 3 pair shares a full 14-bit
    * key. The engine and its oracle share the key layout only through
    * parallel SQL text, so their hash-match cannot catch a layout that
    * is consistently WRONG on both sides — this pins the math itself,
    * plus a bridge check that the Spark expressions compute the same
    * keys as the plain-Scala mirror.
    */
  test("sortedContains == linear membership for arbitrary sorted long arrays") {
    val rng = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val n = rng.nextInt(40) // 0..39 incl. the empty array
      val arr = Array.fill(n)(rng.nextLong() % 1000).distinct.sorted
      val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
      // probe members, near-misses, and extremes
      val probes = arr.toSeq ++ arr.map(_ + 1) ++ arr.map(_ - 1) ++
        Seq(Long.MinValue, Long.MaxValue, 0L)
      probes.foreach { v =>
        assert(TextKernels.sortedContains(ad, v) == arr.contains(v),
          s"v=$v arr=${arr.mkString(",")}")
      }
    }
  }

  test("q45 two-level 14-bit banding is exact at hamming <= 3") {
    def others(sim: Long, b: Int): Long = b match {
      case 0 => sim >> 8
      case 1 => (sim & 255) | ((sim >> 16) << 8)
      case 2 => (sim & 65535) | ((sim >> 24) << 16)
      case 3 => sim & 16777215
    }
    def keys(sim: Long): Seq[Long] =
      for { b <- 0 until 4; sb <- 0 until 4 } yield
        (((sim >> (8 * b)) & 255) << 6) | ((others(sim, b) >> (6 * sb)) & 63)
    // bridge: the engine's SQL expressions == the mirror, per band key
    val session = spark; import session.implicits._
    import org.apache.spark.sql.functions.{array, col, expr}
    val probes = Seq(0L, 0xFFFFFFFFL, 0x12345678L, 0x80000001L, 0xDEADBEEFL)
    val keyExprs = for { b <- 0 until 4; sb <- 0 until 4 } yield
      expr(s"shiftleft(shiftright(simhash, ${b * 8}) & 255, 6) | " +
        s"(shiftright(${graft.queries.Dedup.hamOtherBits(b)}, ${sb * 6}) & 63)")
    val viaExpr = probes.toDF("simhash")
      .select(col("simhash"), array(keyExprs: _*).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    probes.foreach(p => assert(viaExpr(p) == keys(p).toList, f"expr/math drift at $p%08x"))
    // property: any ≤ 3-bit perturbation shares a key AT THE SAME band
    // position (the engine buckets on (band, bbits))
    val rnd = new scala.util.Random(7)
    (1 to 5000).foreach { _ =>
      val base = rnd.nextLong() & 0xFFFFFFFFL
      val flipped = (1 to 1 + rnd.nextInt(3))
        .foldLeft(base)((s, _) => s ^ (1L << rnd.nextInt(32)))
      assert(keys(base).zip(keys(flipped)).exists { case (x, y) => x == y },
        f"ham<=3 pair must share a key: $base%08x vs $flipped%08x")
    }
  }

  test("q104 chunking properties hold on arbitrary texts") {
    import spark.implicits._
    import graft.queries.Pipeline.{ChunkStride, ChunkTokens}
    val texts = samples(text, 120).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val dir = tmpDir("chunk-prop").toString
    texts.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "CAST(coalesce(length(text), 0) AS LONG) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.queries.Catalog.all("q104_chunk_overlap").build(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3))))
      .toMap
    texts.foreach { case (id, t) =>
      val toks = t.split(" ", -1)
      val chunkIds = out.keys.filter(_._1 == id).map(_._2).toSeq.sorted
      // dense chunk ids covering the whole token range; a final window
      // fully contained in its predecessor is not emitted
      val expectedIds = (0 to (toks.length - 1) / ChunkStride).filter(c =>
        c == 0 || c * ChunkStride + ChunkTokens - ChunkStride < toks.length)
      assert(chunkIds == expectedIds, s"doc $id: $chunkIds vs $expectedIds")
      chunkIds.foreach { c =>
        val (n, chunk) = out((id, c))
        val ref = toks.slice(c * ChunkStride, c * ChunkStride + ChunkTokens)
        assert(n == ref.length && chunk == ref.mkString(" "),
          s"doc $id chunk $c: [$chunk] vs [${ref.mkString(" ")}]")
      }
      // stitching the stride-prefix of every chunk (full tail of the
      // last) reconstructs the document exactly — no token lost or duped
      val stitched = chunkIds.map { c =>
        val body = out((id, c))._2.split(" ", -1)
        if (c == chunkIds.last) body else body.take(ChunkStride)
      }.flatten
      assert(stitched.sameElements(toks), s"doc $id does not reconstruct")
    }
  }

  test("q105 quantization properties hold on arbitrary vectors") {
    import spark.implicits._
    val vecGen = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000f, 1000f)))
    val vecs = samples(vecGen, 100).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray, 0) } :+
      ((100L, Array(0f, 0f, 0f), 0))  // force the zero-scale branch
    val dir = tmpDir("quant-prop").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.Catalog.all("q105_embed_quantize").build(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5))))
      .toMap
    vecs.foreach { case (id, emb, _) =>
      val v = emb.map(_.toDouble)
      val scale = v.map(math.abs).max / 127.0
      val q = if (scale == 0.0) v.map(_ => 0)
              else v.map(x => math.max(-127.0, math.min(127.0, math.floor(x / scale + 0.5))).toInt)
      assert(out(id) == ((scale, q.map(_.toLong).sum, q.min, q.max,
        q.count(c => math.abs(c) == 127))), s"vec $id: ${out(id)}")
      if (scale > 0.0) {
        // max-|x| coordinate saturates; every code within half a step
        assert(q.map(math.abs).max == 127)
        v.zip(q).foreach { case (x, c) =>
          assert(math.abs(c * scale - x) <= scale / 2 + 1e-9 * math.abs(x) + 1e-12) }
      }
    }
  }

  test("triangleStats == brute-force census on arbitrary random graphs") {
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.chooseNum(4, 14)
      density <- Gen.chooseNum(1, 4)
      pairs <- Gen.listOfN(n * density,
        Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield pairs.collect { case (a, b) if a != b =>
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.distinct
    samples(edgeGen, 25).filter(_.nonEmpty).foreach { und =>
      val es = und.toSet
      val adj = und.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
      val got = graft.queries.Similarity.triangleStats(und.toDF("a", "b"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(got.keySet == adj.keySet)
      adj.foreach { case (v, ns) =>
        val t = ns.toSeq.combinations(2)
          .count(p => es((math.min(p(0), p(1)), math.max(p(0), p(1))))).toLong
        val (gd, gt, gc) = got(v)
        assert(gd == ns.size.toLong && gt == t, s"vertex $v: ($gd,$gt) vs (${ns.size},$t)")
        assert(gc >= 0.0 && gc <= 1.0, s"cc out of range at $v: $gc")
        val exp = if (ns.size < 2) 0.0 else 2.0 * t / (ns.size.toDouble * (ns.size - 1))
        assert(math.abs(gc - exp) < 1e-12)
      }
      // each triangle contributes exactly 3 vertex participations
      assert(got.values.map(_._2).sum % 3 == 0)
    }
  }

  test("snapshotDiff statuses partition the id union on arbitrary snapshot pairs") {
    import spark.implicits._
    val snapGen = for {
      ids <- Gen.listOfN(12, Gen.chooseNum(0L, 19L)).map(_.distinct)
      mask <- Gen.listOfN(20, Gen.chooseNum(0, 3)) // 0=both-same 1=old-only 2=new-only 3=changed
    } yield ids.map(i => i -> mask(i.toInt))
    samples(snapGen, 25).filter(_.nonEmpty).foreach { plan =>
      val old = plan.collect { case (i, m) if m != 2 => (i, s"d$i") }
      val neu = plan.collect { case (i, m) if m != 1 =>
        (i, if (m == 3) s"D$i" else s"d$i")
      }
      val got = graft.queries.Pipeline.snapshotDiff(
          old.toDF("doc_id", "old_digest"), neu.toDF("doc_id", "new_digest"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.keySet == plan.map(_._1).toSet, "every id emits exactly one row")
      plan.foreach { case (i, m) =>
        val exp = m match {
          case 0 => "same"; case 1 => "removed"; case 2 => "added"; case 3 => "changed"
        }
        assert(got(i) == exp, s"id $i mask $m: ${got(i)} != $exp")
      }
    }
  }
}
