package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skewed equi-join mitigation (the JOIN-side companion of q39's salted
  * aggregation): when one join-key value owns a large share of the
  * skewed side's rows, a plain hash-partitioned join puts that whole
  * share on ONE reducer — at 100 TB the hot task runs for hours while
  * the rest of the cluster idles, or dies outright.
  *
  * Two mitigations, in preference order:
  *
  *  1. **AQE skew-join** (`spark.sql.adaptive.skewJoin.*`): no code
  *     change — AQE detects an oversized sort-merge-join partition at
  *     runtime and splits it, replicating the matching partition of the
  *     other side. This handles unknown/emergent skew and is pinned in
  *     SkewJoinSpec. Prefer it; reach for salting only when AQE can't
  *     apply (non-SMJ plans, aggregation-before-join shapes, streaming).
  *  2. **Salted rewrite** ([[saltedJoin]]): deterministic and
  *     planner-independent — the skewed side fans each hot key over
  *     `shards` salt values (hash of a unique column, the q92/q99
  *     deterministic-coin rule: replays identically, no RNG), and the
  *     other side is replicated `shards`× so every (key, salt) cell
  *     still finds its match. The hot key's reducer load drops by
  *     ~`shards`; the price is `shards`× the other side's shuffle
  *     volume — use when `other` ≪ the skewed side but is still too
  *     large (or too dynamic) to broadcast.
  */
object SkewJoin {

  /** Inner equi-join of `skewed` with `other` on `key`, with the skewed
    * side salted over `shards` partitions-per-key. `saltSource` must be
    * a (near-)unique column on the skewed side — it only seeds the
    * deterministic spread; correctness never depends on it. Result ==
    * `skewed.join(other, key)` exactly (SkewJoinSpec + the q163 oracle
    * pin it).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltSource: String, shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(shards)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(shards - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
