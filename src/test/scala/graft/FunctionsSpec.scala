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
