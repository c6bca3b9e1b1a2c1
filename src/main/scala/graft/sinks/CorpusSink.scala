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

  /** Z-ORDERED layout write — q178's key driving an actual on-disk
    * layout (the OPTIMIZE-ZORDER write path): rows land in partition
    * dirs `zb=<bucket>` where the bucket is the top 6 bits of the
    * Morton interleave of the two clustering dims, so a reader with a
    * range predicate on EITHER OR BOTH dims opens only the bucket dirs
    * whose (u, d) bounding box intersects the query box —
    * [[zOrderedScan]] computes that bucket set driver-side from the
    * persisted bounds and the same bit arithmetic, and partition
    * pruning does the rest (CorpusSinkSpec pins the executed scan's
    * numFiles). No global sort anywhere: the cluster key is scan-stage
    * integer arithmetic, the write shuffles once on the bucket id
    * (the [[write]] small-files discipline). Bounds (and the dim
    * column names) persist to an underscore-prefixed sidecar the
    * parquet reader ignores. Both dims must be integral; bounds come
    * from one 4-value driver aggregate (a bounded model-fit artifact,
    * the q51-centroid precedent).
    */
  def writeZOrdered(df: DataFrame, dir: String, uCol: String, dCol: String,
                    maxRecordsPerFile: Long = 1000000L): Unit = {
    val r = df.agg(min(col(uCol)), max(col(uCol)),
      min(col(dCol)), max(col(dCol))).collect()(0)
    def lv(i: Int): Long = r.getAs[Number](i).longValue()
    val (umin, umax, dmin, dmax) = (lv(0), lv(1), lv(2), lv(3))
    val (ru, rd) = (umax - umin + 1, dmax - dmin + 1)
    val u8 = s"((CAST($uCol AS BIGINT) - $umin) * 256 div $ru)"
    val d8 = s"((CAST($dCol AS BIGINT) - $dmin) * 256 div $rd)"
    val z = graft.queries.Pipeline.mortonZ16(u8, d8,
      (x, n) => s"shiftleft($x, $n)")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("zb", expr(s"$z div 1024"))
      .repartition(n, col("zb"))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("zb")
      .mode("overwrite")
      .parquet(dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_zbounds"),
      s"$uCol $dCol $umin $umax $dmin $dmax")
  }

  /** Box-pruned read over a [[writeZOrdered]] layout: maps the query
    * box to the candidate bucket set via the persisted bounds (each
    * bucket covers one 32×32 cell of the 8-bit normalized grid; a
    * bucket is a candidate iff its cell intersects the normalized
    * query box), filters `zb IN (...)` — partition pruning, so files
    * of other buckets never open — and re-applies the exact range
    * predicates as residuals. An empty intersection returns an empty
    * frame without touching a single file.
    */
  def zOrderedScan(spark: org.apache.spark.sql.SparkSession, dir: String,
                   uRange: (Long, Long), dRange: (Long, Long)): DataFrame = {
    val parts = java.nio.file.Files
      .readString(java.nio.file.Paths.get(dir, "_zbounds")).trim.split(" ")
    val (uCol, dCol) = (parts(0), parts(1))
    val Array(umin, umax, dmin, dmax) = parts.drop(2).map(_.toLong)
    def grid(lo: Long, hi: Long, mn: Long, mx: Long): Option[(Long, Long)] = {
      val (clo, chi) = (math.max(lo, mn), math.min(hi, mx))
      if (clo > chi) None
      else Some(((clo - mn) * 256 / (mx - mn + 1),
        (chi - mn) * 256 / (mx - mn + 1)))
    }
    val cands = (grid(uRange._1, uRange._2, umin, umax),
        grid(dRange._1, dRange._2, dmin, dmax)) match {
      case (Some((ulo, uhi)), Some((dlo, dhi))) =>
        (0 until 64).filter { b =>
          val u3 = ((b >> 5) & 1) << 2 | ((b >> 3) & 1) << 1 | ((b >> 1) & 1)
          val d3 = ((b >> 4) & 1) << 2 | ((b >> 2) & 1) << 1 | (b & 1)
          u3 * 32 <= uhi && ulo <= u3 * 32 + 31 &&
            d3 * 32 <= dhi && dlo <= d3 * 32 + 31
        }
      case _ => Seq.empty[Int]
    }
    val base = spark.read.parquet(dir)
    if (cands.isEmpty) base.filter(lit(false))
    else base
      .filter(col("zb").isin(cands: _*))
      .filter(col(uCol).between(uRange._1, uRange._2) &&
        col(dCol).between(dRange._1, dRange._2))
  }
}
