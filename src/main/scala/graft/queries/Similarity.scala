package graft.queries

import graft.Tables
import graft.functions.VectorFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2.2 Q41): brute-force cosine top-k as the correctness
  * baseline, and an IVF (inverted-file) variant as the scale path — the
  * corpus is partitioned by nearest centroid and queries probe only their
  * top-2 centroid partitions, cutting the scanned fraction to
  * ~probes/centroids of the corpus. Centroid "training" is deterministic
  * (first NumCentroids vectors) so the DuckDB oracle replicates the whole
  * pipeline.
  *
  * Cosine is always computed as dot/(|a||b|) with double math and
  * sequential fold order, which is bit-identical between Spark's
  * zip_with+aggregate and DuckDB's list_dot_product.
  */
object Similarity {

  val NumCentroids = 8
  val NumQueries = 5
  val TopK = 5
  val Probes = 2
  val NumPlanes = 8

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables(s, d, "embeddings"))
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))

  /** (q_id, n_id, cos) candidates → per-query top-k, rank 1..k by
    * (cos DESC, n_id ASC). Native path: the graft_topk bounded-heap
    * aggregate — partial aggregation collapses every partition's
    * candidates to ≤ k rows BEFORE the per-query shuffle. Fallback: the
    * ranking window (identical result; shuffles all candidates).
    */
  private def topkPerQuery(s: SparkSession, cand: DataFrame, k: Int): DataFrame =
    if (s.catalog.functionExists("graft_topk")) {
      cand.groupBy(col("q_id"))
        .agg(call_function("graft_topk", col("cos"), col("n_id"), lit(k)).as("top"))
        .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("q_id"), col("t.id").as("n_id"),
          (col("pos") + 1).cast("int").as("rk"), round(col("t.score"), 4).as("cos"))
    } else {
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
      cand.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("q_id"), col("n_id"), col("rk"), round(col("cos"), 4).as("cos"))
    }

  /** SQL fragment: cosine between two DOUBLE-list columns. */
  private def sqlCos(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  def defs: ListMap[String, Q] = ListMap(

    // ---- brute-force cosine top-k: queries broadcast against the corpus
    "q50_ann_brute" -> Q(
      (s, d) => {
        val e = vecs(s, d)
        val q = e.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        topkPerQuery(s, e.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"),
            cosine(s, col("qv"), col("v")).as("cos")), TopK)
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
              |sc AS (SELECT q_id, e.vec_id AS n_id, ${sqlCos("qv", "e.v")} AS cos
              |       FROM q JOIN e ON e.vec_id <> q.q_id)
              |SELECT q_id, n_id, CAST(rk AS INT) AS rk, round(cos, 4) AS cos FROM (
              |  SELECT *, row_number() OVER (PARTITION BY q_id
              |    ORDER BY cos DESC, n_id) AS rk FROM sc) WHERE rk <= $TopK""".stripMargin),
      headline = true),

    // ---- IVF: assign corpus to nearest centroid, probe top-2 per query
    "q51_ann_ivf" -> Q(
      (s, d) => {
        val e = vecs(s, d)
        val cents = e.filter(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("c_id"), col("v").as("cv"))
        // corpus → nearest centroid (cluster assignment). Argmax via a
        // struct-max aggregation instead of a ranking window: partial
        // (map-side) aggregation collapses the 8×corpus candidate rows
        // BEFORE the shuffle, where the window formulation shuffles them
        // all. Tie-break matches the oracle's (ccos DESC, c_id ASC):
        // max of (ccos, -c_id) picks highest ccos then lowest c_id.
        val assign = e.crossJoin(broadcast(cents))
          .withColumn("ccos", cosine(s, col("v"), col("cv")))
          .groupBy(col("vec_id"))
          .agg(max(struct(col("ccos"), (-col("c_id")).as("neg_cid"))).as("m"),
            first(col("v")).as("v"))
          .select(col("vec_id"), (-col("m.neg_cid")).as("c_id"), col("v"))
        // queries → top-`Probes` centroids
        val wProbe = Window.partitionBy(col("q_id"))
          .orderBy(col("qcos").desc, col("c_id").asc)
        val probes = e.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
          .crossJoin(broadcast(cents))
          .withColumn("qcos", cosine(s, col("qv"), col("cv")))
          .withColumn("rn", row_number().over(wProbe))
          .filter(col("rn") <= Probes)
          .select(col("q_id"), col("qv"), col("c_id"))
        // search only the probed partitions
        topkPerQuery(s, probes.join(assign, "c_id")
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"),
            cosine(s, col("qv"), col("v")).as("cos")), TopK)
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NumCentroids),
              |asg AS (SELECT vec_id, c_id, v FROM (
              |  SELECT e.vec_id, c.c_id, e.v, row_number() OVER (PARTITION BY e.vec_id
              |    ORDER BY ${sqlCos("e.v", "c.cv")} DESC, c.c_id) AS rn
              |  FROM e CROSS JOIN c) WHERE rn = 1),
              |probes AS (SELECT q_id, qv, c_id FROM (
              |  SELECT e.vec_id AS q_id, e.v AS qv, c.c_id, row_number() OVER (
              |    PARTITION BY e.vec_id ORDER BY ${sqlCos("e.v", "c.cv")} DESC, c.c_id) AS rn
              |  FROM e CROSS JOIN c WHERE e.vec_id < $NumQueries) WHERE rn <= $Probes),
              |sc AS (SELECT p.q_id, a.vec_id AS n_id, ${sqlCos("p.qv", "a.v")} AS cos
              |       FROM probes p JOIN asg a ON a.c_id = p.c_id
              |       WHERE a.vec_id <> p.q_id)
              |SELECT q_id, n_id, CAST(rk AS INT) AS rk, round(cos, 4) AS cos FROM (
              |  SELECT *, row_number() OVER (PARTITION BY q_id
              |    ORDER BY cos DESC, n_id) AS rk FROM sc) WHERE rk <= $TopK""".stripMargin),
      headline = true),

    // ---- LSH-bucketed ANN: sign of dot against NumPlanes deterministic
    //      "hyperplanes" (corpus vectors NumCentroids..NumCentroids+7 —
    //      no RNG, so the oracle replicates the buckets exactly) → 8-bit
    //      bucket id; queries search ONLY their own bucket, ~1/2^8 of
    //      the corpus in expectation. Bucket assignment broadcasts the
    //      planes and map-side combines the sign bits before its shuffle.
    "q52_ann_lsh" -> Q(
      (s, d) => {
        val e = vecs(s, d)
        val planes = e
          .filter(col("vec_id") >= NumCentroids && col("vec_id") < NumCentroids + NumPlanes)
          .select(col("vec_id").as("p_id"), col("v").as("pv"))
        val asg = e.crossJoin(broadcast(planes))
          .select(col("vec_id"), col("v"),
            (when(dot(s, col("v"), col("pv")) > 0, lit(1L)).otherwise(lit(0L)) *
              expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p_id - $NumCentroids AS INT))")).as("term"))
          .groupBy(col("vec_id"))
          .agg(sum(col("term")).as("bucket"), first(col("v")).as("v"))
        val q = asg.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
        topkPerQuery(s, q.join(asg, Seq("bucket"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"),
            cosine(s, col("qv"), col("v")).as("cos")), TopK)
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |p AS (SELECT vec_id AS p_id, v AS pv FROM e
              |      WHERE vec_id >= $NumCentroids AND vec_id < ${NumCentroids + NumPlanes}),
              |asg AS (SELECT e.vec_id,
              |    CAST(sum(CASE WHEN list_dot_product(e.v, p.pv) > 0 THEN 1 ELSE 0 END
              |      * (CAST(1 AS BIGINT) << CAST(p.p_id - $NumCentroids AS INT))) AS BIGINT) AS bucket
              |  FROM e CROSS JOIN p GROUP BY e.vec_id),
              |q AS (SELECT a.vec_id AS q_id, e.v AS qv, a.bucket
              |      FROM asg a JOIN e ON e.vec_id = a.vec_id WHERE a.vec_id < $NumQueries),
              |c AS (SELECT a.vec_id, e.v, a.bucket FROM asg a JOIN e ON e.vec_id = a.vec_id),
              |sc AS (SELECT q.q_id, c.vec_id AS n_id, ${sqlCos("q.qv", "c.v")} AS cos
              |       FROM q JOIN c ON c.bucket = q.bucket AND c.vec_id <> q.q_id)
              |SELECT q_id, n_id, CAST(rk AS INT) AS rk, round(cos, 4) AS cos FROM (
              |  SELECT *, row_number() OVER (PARTITION BY q_id
              |    ORDER BY cos DESC, n_id) AS rk FROM sc) WHERE rk <= $TopK""".stripMargin),
      headline = true)
  )
}
