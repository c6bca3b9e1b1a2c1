package graft.plans

import graft.functions.{CollectCapped, CosineSimilarity, DotProduct, HammingDistance, Hash60, MinHashSig, MisraGriesTopK, Shingles3, SimHash, SrpSignature, TopKByScore}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session-extension entry point: registers the engine's native Catalyst
  * expressions so they are callable from both the Column API
  * (`call_function`) and SQL. Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - sequential-fold dot product of two array<double>"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - single-pass cosine similarity of two array<double>"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_shingles3"),
      info("graft_shingles3", "graft_shingles3(text) - distinct word 3-shingles of a string"),
      (children: Seq[Expression]) => Shingles3(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles) - 32-permutation MinHash signature"),
      (children: Seq[Expression]) => MinHashSig(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_hash60"),
      info("graft_hash60", "graft_hash60(text) - 60-bit md5-prefix parity hash"),
      (children: Seq[Expression]) => Hash60(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(text) - 32-bit frequency-weighted SimHash fingerprint"),
      (children: Seq[Expression]) => SimHash(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_mg_candidates"),
      info("graft_mg_candidates",
        "graft_mg_candidates(token, capacity) - Misra-Gries heavy-hitter candidate set"),
      (children: Seq[Expression]) => {
        val cap = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_mg_candidates capacity must be an int literal, got $other")
        }
        MisraGriesTopK(children.head, cap)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_topk"),
      info("graft_topk",
        "graft_topk(score, id, k) - bounded top-k by (score DESC, id ASC), map-side combinable"),
      (children: Seq[Expression]) => {
        val k = children(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an int literal, got $other")
        }
        TopKByScore(children(0), children(1), k)
      }))
    // Spark ships Bloom-filter expressions for its own runtime-filter
    // rewrites but does not register them in the public FunctionRegistry;
    // expose them — they are exactly the right primitive for broadcast-
    // cheap membership pre-filters (q100's decontamination prune).
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(xxhash64_col, n_items, n_bits) - Bloom filter (binary) of a long column"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains",
        "graft_bloom_contains(bloom, xxhash64_value) - membership probe; false = definitely absent"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_collect_capped"),
      info("graft_collect_capped",
        "graft_collect_capped(e, cap) - the cap smallest elements ascending; " +
          "slice(sort_array(collect_list(e)), 1, cap) with O(cap) buffers"),
      (children: Seq[Expression]) => {
        val cap = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_collect_capped cap must be an int literal, got $other")
        }
        CollectCapped(children(0), cap)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_srpsig"),
      info("graft_srpsig",
        "graft_srpsig(v, bits) - sign-random-projection sketch of an array<double>"),
      (children: Seq[Expression]) => {
        val bits = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_srpsig bits must be an int literal, got $other")
        }
        SrpSignature(children.head, bits)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_hamming"),
      info("graft_hamming",
        "graft_hamming(a, b) - Hamming distance between two array<int> signatures"),
      (children: Seq[Expression]) => HammingDistance(children(0), children(1))))
    e.injectOptimizerRule(_ => RewriteVectorHofs)
  }
}
