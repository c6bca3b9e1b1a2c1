package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Column helpers whose results are bit-identical between Spark and DuckDB,
  * so query results can be hash-compared against a DuckDB oracle.
  *
  * The cross-engine deterministic hash is: md5 hex digest → first N hex
  * chars → integer. Spark: `conv(substring(md5(x),1,15),16,10)::bigint`;
  * DuckDB: `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`. 15 hex chars
  * < 2^60 so the value is always a positive BIGINT in both engines.
  */
object ParityFns {

  /** Large prime (2^31 - 1) used as the modulus for MinHash permutations:
    * keeps `a*h + b` products under 2^62, so 64-bit arithmetic never
    * overflows in either engine.
    */
  val P: Long = 2147483647L

  /** 60-bit deterministic hash of a string column (see object doc). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** 32-bit deterministic hash (8 hex chars → [0, 2^32)). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** hash60 reduced mod P — the MinHash element hash. */
  def hashModP(c: Column): Column = hash60(c) % P

  /** Epoch milliseconds of a (possibly NTZ) timestamp column. Outputs
    * BIGINT instead of raw timestamps because naive-vs-UTC parquet
    * annotations differ between engines; epoch ms is unambiguous.
    * Session timezone is pinned to UTC so the NTZ→TZ cast is identity.
    */
  def epochMs(c: Column): Column = unix_millis(c.cast(TimestampType))

  /** Whitespace word tokens — documents.text is single-space separated.
    * DuckDB mirror: `string_split(text, ' ')`.
    */
  def wordTokens(text: Column): Column = split(text, " ")

  /** Distinct word 3-shingles of a text column, as an array<string>.
    * Mirrors the DuckDB window formulation
    * `w || ' ' || lead(w,1) || ' ' || lead(w,2)` + DISTINCT.
    * Guarded so texts with <3 tokens yield an empty array (Spark's
    * `sequence(1, 0)` would otherwise count DOWN).
    */
  def shingles3(text: Column): Column = {
    val toks = wordTokens(text)
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3)))))
        .otherwise(array().cast("array<string>")))
  }
}
