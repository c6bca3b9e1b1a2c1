package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader (TESTDATA.md): one parquet file per table under a
  * scale-factor directory. All query builders go through here so the scan
  * path (predicate pushdown, column pruning) stays uniform.
  *
  * `events.ts` has shipped in two physical forms across fixture
  * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
  * reader rejects — read as raw nanos via `nanosAsLong`, truncate with
  * `div 1000` to the micros a TIMESTAMP column carries, exactly what
  * DuckDB's nanos→TIMESTAMP read does) and native TIMESTAMP(MICROS)
  * without timezone (read as TIMESTAMP_NTZ — cast to the session-zone
  * timestamp, an identity on the wall-clock fields under the UTC
  * session every entrypoint pins). Both normalize to the same TIMESTAMP
  * column, so oracle parity holds either way; any OTHER physical form
  * throws at load (EventsTsSpec pins both supported forms end to end).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Rebalance a scan before CPU-heavy per-row work (shingling, md5
    * hashing, vector math). The fixture tables are single-row-group
    * parquet files, so their scans yield ONE partition and per-row
    * compute would serialize on one core regardless of cluster size; at
    * full scale inputs arrive in many splits and this becomes a no-op.
    * The round-robin shuffle moves only the scanned bytes, negligible
    * next to the downstream compute it parallelizes.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // leaf-file count is a metadata lookup; df.rdd.getNumPartitions would
    // force an RDD lineage materialization on the driver per query build
    if (df.inputFiles.length < target) df.repartition(target) else df
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // With nanosAsLong set, LongType means parquet TIMESTAMP(NANOS)
          // (a plain-INT64 ts would surface identically — if a future
          // fixture ships epoch-micros/millis as bare INT64 this scaling
          // is wrong; the log line is the loud breadcrumb for that day)
          org.apache.log4j.Logger.getLogger(getClass)
            .info("events.ts is INT64: treating as TIMESTAMP(NANOS) and truncating to micros")
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case org.apache.spark.sql.types.TimestampType => raw
        case other => throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — expected " +
            "TIMESTAMP(NANOS) (int64), TIMESTAMP_NTZ, or TIMESTAMP; refusing " +
            "to guess a unit (silent mis-scaling would corrupt every window)")
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every fixture table as a temp view so a SQL-first user can
    * `spark.sql("SELECT ... FROM lineitem JOIN orders ...")` directly —
    * together with the graft_* functions from GraftExtensions this makes
    * the whole engine drivable from plain SQL. Views are lazy plans over
    * the same loader, so pushdown/pruning and the events timestamp
    * normalization are identical to the Column-API path.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(name => apply(spark, sfDir, name).createOrReplaceTempView(name))
}
