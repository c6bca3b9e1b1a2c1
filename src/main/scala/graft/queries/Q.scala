package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark DataFrame builder over a scale-factor dir,
  * an optional DuckDB oracle SQL (same table names, same column aliases —
  * the driver sorts columns by name and hash-compares values), and a
  * headline flag (included in the Bench run).
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
