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
}
