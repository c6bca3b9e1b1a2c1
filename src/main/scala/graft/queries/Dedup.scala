package graft.queries

import graft.Tables
import graft.functions.ParityFns._
import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Deduplication family over the documents/embeddings tables: exact
  * (hash-groupBy), MinHash+LSH band-bucketing, SimHash, exact n-gram
  * Jaccard via inverted index, and embedding-cosine near-dup. Every
  * stage is deterministic (md5-derived integer hashing, fixed permutation
  * constants) so each query has a full DuckDB oracle replicating the
  * algorithm, not just the output shape.
  */
object Dedup {

  /** MinHash permutation constants (a, b) for h' = (a*h + b) mod P, with
    * h already reduced mod P = 2^31-1 so products stay under 2^62.
    * Generated from fixed multipliers; identical literals are
    * interpolated into the DuckDB oracle, so both engines use the same
    * permutations by construction.
    */
  val NumHashes: Int = graft.functions.TextKernels.NumHashes
  val BandRows = 4                       // 8 bands × 4 rows
  val NumBands: Int = NumHashes / BandRows
  /** Canonical permutation constants — defined next to the native kernel
    * so the codegen path, HOF fallback, and DuckDB oracle all share them.
    */
  val seeds: IndexedSeq[(Long, Long)] = graft.functions.TextKernels.seeds

  /** q44 embedding-LSH parameters: hyperplanes are the corpus vectors
    * [EmbPlaneBase, EmbPlaneBase + EmbNumPlanes) — deterministic, so the
    * DuckDB oracle reproduces the buckets bit-for-bit. EmbBandBits sign
    * bits per band ⇒ 2^EmbBandBits buckets per band; scale it with
    * corpus size to keep buckets bounded.
    */
  val EmbPlaneBase: Int = Similarity.NumCentroids // shared plane region with q52
  val EmbBandBits = 4
  val EmbBands = 8
  val EmbNumPlanes: Int = EmbBands * EmbBandBits

  private def native(s: SparkSession): Boolean =
    s.catalog.functionExists("graft_shingles3")

  /** documents → (doc_id, sh: array<string> of distinct word 3-shingles),
    * docs with <3 tokens dropped (no shingles ⇒ can't participate).
    * Native kernel when registered; bit-identical HOF fallback otherwise.
    */
  private def shingled(s: SparkSession, d: String): DataFrame = {
    val sh = if (native(s)) call_function("graft_shingles3", col("text"))
             else shingles3(col("text"))
    Tables.spread(Tables(s, d, "documents"))
      .select(col("doc_id"), sh.as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** All ordered pairs (fields `a` < `b`) from a SORTED array — the
    * in-bucket candidate generator. Replaces a self-join: a bucket of k
    * elements yields its k(k-1)/2 pairs in one pass with no second
    * evaluation of the (expensive) upstream subtree and no extra shuffle.
    * Same asymptotics as the join (pair count is quadratic in bucket size
    * either way), but the input is evaluated once instead of twice.
    * Elements may be structs (doc_id first so the sort orders by id);
    * carrying the shingle payload through lets verification run join-free.
    */
  private def sortedPairs(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)),
        y => struct(x.as("a"), y.as("b")))))

  /** Shared DuckDB CTE prefix: tokenize → distinct 3-shingles per doc. */
  private val shingleCte =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
      |      || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS s
      |  FROM tok
      |  QUALIFY lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL)""".stripMargin

  def defs: ListMap[String, Q] = ListMap(

    // ---- Q39/Q25: exact dedup via hash-groupBy. Grouping on sha2(text)
    //      rather than the raw text keeps shuffle keys 32 bytes at 100 TB.
    "q40_dedup_exact" -> Q(
      (s, d) => {
        Tables(s, d, "documents")
          .groupBy(sha2(col("text"), 256).as("__h"))
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
          .select(col("keeper"), col("n_copies"))
      },
      Some("""SELECT min(doc_id) AS keeper, count(*) AS n_copies
             |FROM documents GROUP BY text""".stripMargin),
      headline = true),

    // ---- Q40: MinHash + LSH near-dup. Signatures are computed per-doc
    //      in one pass (native kernel / HOF fallback — no 32× row
    //      blow-up); candidates come from per-bucket pair generation
    //      after one (band, signature) shuffle, then exact-Jaccard
    //      verification, join-free. Band buckets are size-capped
    //      (BucketCap) — the duplicate-heavy-corpus guard.
    "q41_dedup_minhash" -> Q(
      (s, d) => minhashPairs(s, d, BucketCap),
      Some(minhashOracle(BucketCap)),
      headline = true),

    // ---- Q40 variant: SimHash — 32-bit signed-bit fingerprint weighted
    //      by token frequency. Map-side partial aggregation absorbs the
    //      (doc, token) and (doc, bit) group-bys at scale.
    "q42_dedup_simhash" -> Q(
      (s, d) => if (native(s)) {
        // zero-shuffle scalar form — the two group-bys below exist only
        // to express the same fingerprint relationally
        Tables.spread(Tables(s, d, "documents"))
          .select(col("doc_id"), call_function("graft_simhash", col("text")).as("simhash"))
      } else {
        val tok = Tables.spread(Tables(s, d, "documents"))
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val tc = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
        val th = tc.withColumn("h", hash32(col("w")))
        val bits = th
          .select(col("doc_id"), col("h"), col("cnt"),
            explode(sequence(lit(0), lit(31))).as("j"))
          .groupBy(col("doc_id"), col("j"))
          .agg(sum(when(expr("(shiftright(h, j) & 1) = 1"), col("cnt"))
            .otherwise(-col("cnt"))).as("sm"))
        bits.groupBy(col("doc_id"))
          .agg(sum(when(col("sm") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
            .otherwise(lit(0L))).as("simhash"))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
             |tc AS (SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY doc_id, w),
             |th AS (SELECT doc_id, CAST('0x' || substr(md5(w),1,8) AS BIGINT) AS h, cnt FROM tc),
             |bits AS (SELECT doc_id, j,
             |    sum(CASE WHEN (h >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS sm
             |  FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS j)
             |  GROUP BY doc_id, j)
             |SELECT doc_id, CAST(sum(CASE WHEN sm > 0 THEN CAST(1 AS BIGINT) << j
             |  ELSE 0 END) AS BIGINT) AS simhash
             |FROM bits GROUP BY doc_id""".stripMargin),
      headline = true),

    // ---- Q40: exact n-gram Jaccard all-pairs via inverted-index join on
    //      the shingle (never a cross join — pairs materialize only for
    //      docs that actually share a shingle). Ultra-common shingles
    //      (df > DfCap — stopword runs) are dropped from the index, the
    //      standard guard against quadratic posting-list buckets at
    //      100 TB; signal shingles stay exact (fixture max df 25 ≪ cap,
    //      so the capped and uncapped results coincide — DedupCapSpec
    //      exercises the engaged cap).
    "q43_ngram_jaccard" -> Q(
      (s, d) => ngramJaccard(s, d, DfCap),
      Some(ngramJaccardOracle(DfCap)),
      headline = true),

    // ---- Q41 variant: embedding-cosine near-dup pairs, LSH-bucketed —
    //      multi-band hyperplane signatures (EmbBands bands ×
    //      EmbBandBits sign bits, planes = deterministic corpus vectors
    //      so the oracle replicates the buckets exactly), size-capped
    //      in-bucket pair generation via sortedPairs (never an all-pairs
    //      join), exact cosine verify. APPROXIMATE BY DESIGN: recall vs
    //      brute force is the standard LSH band tradeoff — measured in
    //      EmbedNeardupSpec (target ≥ 0.6 at the fixture scale; raise
    //      EmbBands for more recall at linearly more signature cost).
    //      At 100 TB: EmbBandBits sizes the bucket count (2^bits per
    //      band) — raise it with corpus size so buckets stay bounded;
    //      4 bits fits the fixture corpus (~n/16 per bucket).
    "q44_embed_neardup" -> Q(
      (s, d) => embedNeardup(s, d, BucketCap),
      Some(embedNeardupOracle(BucketCap)))
  )

  /** q43's document-frequency cap: shingles appearing in more than DfCap
    * documents are dropped from the inverted index — they are stopword
    * runs carrying no dedup signal, and their posting lists are the
    * quadratic pair buckets that kill the job at 100 TB. Far above any
    * fixture df (max 25 at sf0.1), so capped ≡ uncapped on test data.
    */
  val DfCap = 1000

  /** q43's shared builder — `dfCap` bounds every posting list (and so
    * every quadratic pair bucket) at dfCap entries. Carry each doc's
    * shingle COUNT through the inverted index (one int per posting) so
    * the Jaccard denominator needs no join back to the corpus: one
    * evaluation of the shingle subtree, two shuffles total (posting-list
    * groupBy, pair groupBy).
    */
  def ngramJaccard(s: SparkSession, d: String, dfCap: Int): DataFrame = {
    val docs = shingled(s, d)
    val e = docs.select(col("doc_id"), size(col("sh")).cast("long").as("n"),
      explode(col("sh")).as("s"))
    e.groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= dfCap)
      .select(explode(sortedPairs(col("ids"))).as("p"))
      .groupBy(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        col("p.a.n").as("na"), col("p.b.n").as("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jac", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jac") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
  }

  /** The DuckDB mirror of [[ngramJaccard]] with the identical df cap
    * (intersections count only shingles with 2 ≤ df ≤ cap; denominators
    * stay the full per-doc shingle counts).
    */
  def ngramJaccardOracle(dfCap: Int): String =
    shingleCte + ",\n" + s"""sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $dfCap),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          JOIN keep k ON k.s = a.s
        |          GROUP BY a.doc_id, b.doc_id)
        |SELECT i.doc_a, i.doc_b, round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) AS jaccard
        |FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b
        |WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.5""".stripMargin
}
