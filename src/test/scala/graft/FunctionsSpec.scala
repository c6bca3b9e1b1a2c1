package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.functions.Gzip
import graft.ingest.AuditModel
import graft.operators.MediaPipeline
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Scalar-surface specs: gzip round-trip (R9/R10), the pid-parse regex vs
  * the reference's exact substring algorithm (R4, property-based), and the
  * batched media decode plumbing (Q43).
  */
class FunctionsSpec extends SparkSuite {

  /** Deterministic sampler (scalatestplus bridge isn't on the classpath):
    * n samples from a Gen with fixed seeds.
    */
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** The SparkSessionExtensions contract: every graft_* registration is
    * callable from plain SQL, scalars and aggregates alike — the surface
    * a SQL-only user of the library sees. NB: the scalar-subquery
    * graft_bloom_contains shape below fails whole-stage codegen inside
    * Spark's BloomFilterMightContain and evaluates via the interpreted
    * fallback (a logged CompileException, then correct results); q100's
    * production shape passes the filter as a BINARY LITERAL, the form
    * the expression is codegen'd for.
    */
  test("every registered graft_* function is callable from SQL") {
    val scalar = spark.sql(
      """SELECT
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        |  size(graft_shingles3('a b c d')) AS sh,
        |  size(graft_minhash(graft_shingles3('a b c d'))) AS mh,
        |  graft_hash60('x') > 0 AS h60,
        |  graft_simhash('a b') AS sim,
        |  size(graft_srpsig(array(1.0D, 2.0D), 8)) AS srp,
        |  graft_hamming(array(1, 0, 1), array(1, 1, 1)) AS ham,
        |  graft_sorted_contains(array(1L, 5L, 9L), 5L) AS sc_hit,
        |  graft_sorted_contains(array(1L, 5L, 9L), 4L) AS sc_miss
        |""".stripMargin).head()
    assert(scalar.getDouble(0) == 11.0 && scalar.getDouble(1) == 1.0)
    assert(scalar.getInt(2) == 2 && scalar.getInt(3) == 32)
    assert(scalar.getBoolean(4) && scalar.getInt(7) == 1)
    assert(scalar.getBoolean(8) && !scalar.getBoolean(9))

    val agg = spark.sql(
      """SELECT
        |  graft_topk(score, id, 1) AS top,
        |  graft_collect_capped(id, 2) AS capped,
        |  graft_mg_candidates(t, 4) AS mg,
        |  graft_bloom_agg(xxhash64(t), 10L, 800L) AS bf
        |FROM VALUES (0.5D, 3L, 'a'), (0.9D, 1L, 'b'), (0.7D, 2L, 'c')
        |  AS v(score, id, t)""".stripMargin).head()
    assert(agg.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1)) == Seq(1L))
    assert(agg.getSeq[Long](1) == Seq(1L, 2L))
    assert(agg.getSeq[String](2).toSet == Set("a", "b", "c"))
    val hit = spark.sql(
      """SELECT graft_bloom_contains(
        |  (SELECT graft_bloom_agg(xxhash64(t), 10L, 800L)
        |   FROM VALUES ('a'), ('b') AS v(t)), xxhash64('a')) AS hit,
        |graft_bloom_contains(
        |  (SELECT graft_bloom_agg(xxhash64(t), 10L, 800L)
        |   FROM VALUES ('a'), ('b') AS v(t)), xxhash64('zzzz')) AS miss
        |""".stripMargin).head()
    assert(hit.getBoolean(0), "bloom must contain an inserted key")
    assert(!hit.getBoolean(1), "800 bits / 2 items: 'zzzz' must miss (deterministic hashing)")
  }

  test("wrong arity from SQL is a usage error naming the signature, not an IOOBE") {
    // one per arity class: variadic-looking misuse of a 3-, 2-, and 1-arg
    // function must surface the registered usage string
    Seq(
      "SELECT graft_bloom_agg(xxhash64('a')) FROM VALUES ('a') AS v(t)",
      "SELECT graft_bloom_contains(CAST(NULL AS BINARY))",
      "SELECT graft_topk(1.0D, 1L) FROM VALUES (1) AS v(x)",
      "SELECT graft_hash60('a', 'b')",
      "SELECT graft_cosine(array(1.0D))").foreach { q =>
      val ex = intercept[Exception](spark.sql(q).collect())
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => s"${t.getClass.getName}: ${t.getMessage}").mkString("\n")
      assert(msgs.contains("usage:"), s"query [$q] raised:\n$msgs")
      assert(!msgs.contains("IndexOutOfBounds"), s"query [$q] raised:\n$msgs")
    }
  }

  // ---- R9/R10 gzip
  test("gzip round-trip is identity and magic-byte sniff works") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val c = Gzip.compress(s.getBytes(UTF_8))
      assert(Gzip.isCompressed(c))
      assert(new String(Gzip.decompress(c), UTF_8) == s)
      // transparent passthrough of uncompressed bytes
      assert(new String(Gzip.decompress(s.getBytes(UTF_8)), UTF_8) == s)
    }
  }

  test("conditional compression honors the size threshold (reference default 512)") {
    val small = "x" * 512            // == threshold: NOT compressed (strict >)
    val big = "y" * 513
    assert(!Gzip.isCompressed(Gzip.compressIfLarge(small, 512)))
    assert(Gzip.isCompressed(Gzip.compressIfLarge(big, 512)))
  }

  test("gzip column API round-trips through a DataFrame") {
    import spark.implicits._
    val texts = Seq("short", "z" * 2000)
    val out = texts.toDF("t")
      .select(Gzip.gunzip_str(Gzip.gzip_if_large(col("t"), lit(512))).as("rt"))
      .as[String].collect()
    assert(out.toSeq == texts)
  }

  // ---- R4 pid parse: regex column vs the reference's substring algorithm
  private val nameGen: Gen[String] = for {
    inst <- Gen.alphaNumStr.suchThat(s => s.nonEmpty && !s.contains("_"))
    pid <- Gen.choose(1L, 4194304L)
    seq <- Gen.choose(1L, 999999L)
  } yield s"/audit/${inst}_ora_${pid}_$seq.xml"

  test("pidFromPath matches the reference substring algorithm on conventional names") {
    import spark.implicits._
    val paths = samples(nameGen, 200)
    val got = paths.toDF("path")
      .select(AuditModel.pidFromPath(col("path")).as("pid"))
      .as[Option[String]].collect()
    paths.zip(got).foreach { case (p, g) =>
      assert(g == AuditModel.referencePidParse(p), s"mismatch for $p")
    }
  }

  test("pidFromPath yields null where the reference parse fails") {
    import spark.implicits._
    val weird = Seq("noseparators.xml", "nounderscore/", "_x")
    val got = weird.toDF("path")
      .select(AuditModel.pidFromPath(col("path")).as("pid")).as[Option[String]].collect()
    weird.zip(got).foreach { case (p, g) =>
      assert(g == AuditModel.referencePidParse(p), s"mismatch for $p")
    }
  }

  test("media resize bounds payloads; frame sampling keeps every stride-th frame") {
    val docs = Tables(spark, sf(), "documents").limit(20)
    val media = MediaPipeline.documentsAsMedia(docs)
    val resized = MediaPipeline.resize(media, 64).collect()
    assert(resized.forall(_.content.length <= 64))
    // resize is deterministic: same input → same bytes
    val again = MediaPipeline.resize(media, 64).collect()
    assert(resized.map(_.content.toSeq).toSeq == again.map(_.content.toSeq).toSeq)

    val frames = MediaPipeline.sampleFrames(media, frameBytes = 32, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 == 0))
    assert(frames.forall(_.frame.length <= 32))
  }

  // ---- Q43 media decode plumbing
  test("media pipeline extracts deterministic features in bounded batches") {
    val docs = Tables(spark, sf(), "documents").limit(100)
    val feats = MediaPipeline.extractFeatures(MediaPipeline.documentsAsMedia(docs))
      .collect()
    assert(feats.length == 100)
    feats.foreach { f =>
      assert(f.histogram.sum == f.n_bytes) // every byte lands in one bucket
      assert(f.kind == "text/plain")
    }
  }
}
