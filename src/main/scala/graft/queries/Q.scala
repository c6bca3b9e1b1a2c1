package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark DataFrame builder over a scale-factor dir,
  * an optional DuckDB oracle SQL (same table names, same column aliases —
  * the driver sorts columns by name and hash-compares values), and a
  * headline flag (included in the Bench run).
  *
  * `probe` is the fit/probe split for index- and model-carrying entries
  * (band index, BM25 postings, IVF centroids + assignment, BPE merges,
  * DSIR delta map): calling it runs the FIT — building and materializing
  * the reusable artifact production computes once and stores — and
  * returns a thunk assembling the per-batch SERVING plan against that
  * prebuilt artifact. Bench times `build` (cold end-to-end, fit
  * included) AND the thunk (probe-only — what a standing deployment
  * pays per batch) as separate numbers; conflating them made the
  * cold number look like a per-query regression whenever a fit grew
  * (round-9 verdict). The thunk must not persist anything itself; the
  * caller clears the cache when done with the artifact.
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    probe: Option[(SparkSession, String) => () => DataFrame] = None)
