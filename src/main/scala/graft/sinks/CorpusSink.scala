package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The OUTPUT side of the corpus pipeline: write a finished corpus as
  * partitioned parquet without the two classic 100 TB failure modes —
  *
  *  - the SMALL-FILES problem: naive `df.write.partitionBy(cols)` emits
  *    one file per (task × partition-value) combination; with 32 tasks ×
  *    a few hundred partition values that is tens of thousands of tiny
  *    files per write, and a 1000-executor cluster makes it millions.
  *    Fix: repartition BY the partition columns first, so each value's
  *    rows land in few tasks.
  *  - the GIANT-FILE problem: one task holding a whole hot partition
  *    value writes one multi-GB file that downstream readers can't
  *    split across row groups they want. Fix: `maxRecordsPerFile`
  *    rolls files at a bounded row count.
  *
  * Skew guard: repartitioning by partition value alone puts a hot value
  * (e.g. lang=en at 60% of the corpus) into ONE task. `shards > 1`
  * spreads each value over that many tasks via a deterministic id-hash
  * shard column (dropped before the write — it exists only to salt the
  * exchange, the q39 salting pattern applied to writes).
  */
object CorpusSink {

  /** Write `df` to `dir` partitioned by `parts`, each value spread over
    * `shards` tasks, files rolled every `maxRecordsPerFile` rows.
    * `idCol` drives the deterministic shard hash (any stable key).
    */
  def write(df: DataFrame, dir: String, parts: Seq[String], idCol: String,
            shards: Int = 4, maxRecordsPerFile: Long = 1000000L): Unit = {
    require(parts.nonEmpty, "partitionBy columns required")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val shard = pmod(xxhash64(col(idCol)), lit(shards))
    // EXPLICIT partition count: a bare repartition(cols) is marked
    // AQE-coalescible, and on a small write AQE merges the shard salt
    // right back into one task — the count is the session's normal
    // shuffle fan-out, only pinned
    // sessionState's ALREADY-PARSED value, not conf.get(..).toInt: some
    // platforms set the raw conf to a non-numeric value ("auto") that
    // their own resolver interprets, and the parse would throw there
    val n = df.sparkSession.sessionState.conf.numShufflePartitions.max(shards)
    df.withColumn("__shard", shard)
      .repartition(n, (parts.map(col) :+ col("__shard")): _*)
      .drop("__shard")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(parts: _*)
      .mode("overwrite")
      .parquet(dir)
  }

  /** Write an INDEX-side artifact as a bucketed, bucket-sorted table —
    * the on-disk recurrence contract of the incremental gates (q97's
    * sha2 digest set bucketed by `h`, q106's band index bucketed by
    * (band, bsig)). Every future batch's join against the artifact
    * requires hashpartitioning on exactly these keys, and a bucketed
    * scan already PROVIDES it: the corpus side of the recurring join
    * needs no Exchange — and, bucket-sorted with one file per bucket,
    * no Sort — no matter how large the corpus grows; only the (small)
    * batch side shuffles, to the bucket count. BucketedGateSpec pins
    * both plans; ScaleProbe `--bucketgate` measures the recurrence.
    *
    * Bucketing metadata lives in the session catalog, not the files
    * (Spark cannot express it through a bare `.parquet(dir)` write),
    * hence saveAsTable with an explicit storage path. The repartition
    * aligns write tasks with bucket ids — repartition(n, keys) and the
    * bucket assignment use the same Murmur3 hashpartitioning, so each
    * task holds exactly one bucket and each bucket gets ONE file, the
    * precondition for Spark trusting the sortBy metadata at read time —
    * note Spark 3.0+ additionally gates sorted-scan awareness behind
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (off by
    * default because a multi-file bucket has no global order); set it
    * in deployments reading these single-file-per-bucket artifacts to
    * shed the corpus-side Sort as well as the Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, dir: String,
                    bucketCols: Seq[String], nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "bucket columns required")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, bucketCols.map(col): _*)
      .write
      .option("path", dir)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
