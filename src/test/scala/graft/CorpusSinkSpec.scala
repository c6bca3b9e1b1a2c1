package graft

import java.nio.file.{Files, Paths}

import graft.sinks.CorpusSink
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Output-layout guards for the partitioned corpus writer: bounded file
  * counts (no small-files explosion), bounded file sizes (rolled by row
  * count), hot values spread over the shard salt, lossless read-back.
  */
class CorpusSinkSpec extends SparkSuite {

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] = {
    val s = Files.walk(Paths.get(dir))
    try s.iterator().asScala.toSeq.filter(_.toString.endsWith(".parquet"))
    finally s.close()
  }

  test("partitioned write: lang dirs, files bounded by shards and rolled by row count") {
    val docs = Tables(spark, sf(), "documents")
    val dir = tmpDir("corpus-sink").toString
    val shards = 2
    CorpusSink.write(docs, dir, Seq("lang"), "doc_id",
      shards = shards, maxRecordsPerFile = 25)
    val langs = docs.select(col("lang")).distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      val files = parquetFiles(s"$dir/lang=$l")
      assert(files.nonEmpty, s"missing partition dir for lang=$l")
      val rows = docs.filter(col("lang") === l).count()
      // each shard task rolls every 25 rows; worst case adds one file
      // per shard for the remainder
      val maxFiles = shards * (rows / 25 + 1)
      assert(files.size <= maxFiles,
        s"lang=$l: ${files.size} files for $rows rows exceeds bound $maxFiles")
    }
    // rolled: no file may exceed maxRecordsPerFile rows
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("f")).groupBy("f").count()
      .agg(max("count")).head().getLong(0)
    assert(perFile <= 25, s"a file holds $perFile rows > maxRecordsPerFile")
    // lossless round-trip (partition column comes back typed as string)
    val back = spark.read.parquet(dir)
      .select(docs.columns.map(col).toIndexedSeq: _*)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs.withColumn("lang", col("lang"))).count() == 0)
  }

  test("crash-replay idempotence: re-writing the same batch leaves content and " +
      "file bound unchanged (round-17 verdict #5)") {
    // q246 pins round-trip CONTENT; this pins REPLAY: a foreachBatch
    // sink that crashed after (or mid-) commit re-delivers the same
    // batch id on restart, and CorpusSink.write must converge to the
    // same files — no duplicate shards, no stale leftovers — because
    // mode(overwrite) replaces the target wholesale. Digest is the
    // q246 recipe: sha2 over the sorted per-row digests.
    val docs = Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val dir = tmpDir("corpus-sink-replay").toString
    def digestOf: (Long, Long, String) = {
      val back = spark.read
        .schema("doc_id BIGINT, text STRING, lang STRING").parquet(dir)
      val r = back.agg(
        count(lit(1)),
        sha2(array_join(array_sort(collect_list(sha2(
          concat_ws(":", col("doc_id"), col("text"), col("lang")), 256))),
          ""), 256)).head()
      (r.getLong(0), parquetFiles(dir).size.toLong, r.getString(1))
    }
    val shards = 2
    def writeOnce(): Unit = CorpusSink.write(docs, dir, Seq("lang"), "doc_id",
      shards = shards, maxRecordsPerFile = 25)

    writeOnce()
    val (rows1, files1, sha1) = digestOf

    // replay of a CLEANLY-committed batch (restart after sink commit,
    // before the source ack): content digest and row count identical,
    // file count still within the shard/roll bound
    writeOnce()
    val (rows2, files2, sha2x) = digestOf
    assert(rows2 == rows1 && sha2x == sha1,
      s"replay changed content: rows $rows1->$rows2, sha $sha1->$sha2x")
    val langRows = docs.groupBy(col("lang")).count().collect()
    val bound = langRows.map(r => shards * (r.getLong(1) / 25 + 1)).sum
    assert(files2 <= bound,
      s"replay accumulated files: $files2 > bound $bound (duplicate shards?)")

    // replay over a PARTIAL first attempt: a stale orphan shard from a
    // crashed write sits in a partition dir; overwrite must remove it,
    // not merge it into the corpus
    val victim = parquetFiles(dir).head
    val orphan = victim.resolveSibling("part-99999-orphan.snappy.parquet")
    Files.copy(victim, orphan)
    assert(digestOf._1 > rows1, "orphan should inflate the raw read")
    writeOnce()
    val (rows3, files3, sha3) = digestOf
    assert(rows3 == rows1 && sha3 == sha1 && files3 <= bound,
      s"replay over a partial attempt did not converge: rows $rows3, files $files3")
  }

  test("hot partition value spreads across the shard salt, not one task's file") {
    val session = spark; import session.implicits._
    // 400 rows of ONE lang: unsalted, one task writes them all; with
    // shards=4 the value must span multiple files even at a high roll cap
    val hot = (1L to 400L).map(i => (i, s"text $i", "en")).toDF("doc_id", "text", "lang")
    val dir = tmpDir("corpus-sink-hot").toString
    CorpusSink.write(hot, dir, Seq("lang"), "doc_id",
      shards = 4, maxRecordsPerFile = 1000000L)
    val files = parquetFiles(s"$dir/lang=en")
    assert(files.size >= 2 && files.size <= 4,
      s"expected the hot value spread over 2..4 shard files, got ${files.size}")
  }

  test("read-side partition PRUNING: a partition-column filter skips non-matching dirs") {
    // the read-side payoff of the partitioned layout — at 100 TB a
    // day/lang predicate must become a metadata-only PartitionFilter
    // (files of other partitions never open), not a post-scan filter.
    // Pinned two ways: the scan node advertises the filter, and the
    // planned inputFiles are confined to the matching directory.
    val docs = Tables(spark, sf(), "documents")
    val dir = tmpDir("corpus-sink-prune").toString
    CorpusSink.write(docs, dir, Seq("lang"), "doc_id",
      shards = 2, maxRecordsPerFile = 1000000L)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
      .select(col("doc_id"), col("text"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"partition filter missing from the scan:\n$plan")
    // NB inputFiles reads the UNPRUNED FileIndex — the honest signal is
    // the executed scan's numFiles metric, read from the SAME
    // QueryExecution that ran (count() would spawn its own)
    assert(q.collect().length.toLong == docs.filter(col("lang") === "en").count())
    val executed = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scanned = executed.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.getOrElse(fail("no FileSourceScanExec in the executed plan"))
    val enFiles = parquetFiles(s"$dir/lang=en").size.toLong
    val allFiles = parquetFiles(dir).size.toLong
    assert(scanned == enFiles,
      s"scan opened $scanned files, lang=en holds $enFiles")
    assert(scanned < allFiles,
      s"pruning must reduce the file set ($scanned of $allFiles)")
  }

  test("z-ordered layout: a 2-dim box scan prunes most bucket dirs") {
    // the read-side payoff of q178's key as an ACTUAL layout: a range
    // predicate on BOTH dims must open only the bucket dirs whose
    // bounding box intersects the query box. A user_id-sorted layout
    // answers day predicates with a full scan and vice versa; the
    // z-order bucket dirs prune on either.
    val ev = Tables(spark, sf(), "events").select(col("user_id"),
      expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)")
        .as("dday"),
      col("event_id"))
    val dir = tmpDir("corpus-zorder").toString
    CorpusSink.writeZOrdered(ev, dir, "user_id", "dday")

    val b = ev.agg(min(col("user_id")), max(col("user_id")),
      min(col("dday")), max(col("dday"))).collect()(0)
    val (umin, umax, dmin, dmax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // an eighth-by-eighth box in the middle of each dim
    val (ru, rd) = (umax - umin + 1, dmax - dmin + 1)
    val uR = (umin + ru / 4, umin + ru / 4 + math.max(1L, ru / 8) - 1)
    val dR = (dmin + rd / 4, dmin + rd / 4 + math.max(1L, rd / 8) - 1)

    val q = CorpusSink.zOrderedScan(spark, dir, uR, dR)
      .select(col("event_id"))
    val got = q.collect().map(_.getLong(0)).toSet
    val expected = ev.filter(col("user_id").between(uR._1, uR._2) &&
        col("dday").between(dR._1, dR._2))
      .collect().map(r => r.getLong(2)).toSet
    assert(got == expected, s"box scan wrong: ${got.size} vs ${expected.size}")
    assert(got.nonEmpty, "the planted box must contain rows")

    val executed = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scanned = executed.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.getOrElse(fail("no FileSourceScanExec in the executed plan"))
    val allFiles = parquetFiles(dir).size.toLong
    assert(scanned * 2 <= allFiles,
      s"an eighth-square box must prune at least half the files " +
        s"($scanned of $allFiles opened)")

    // a box fully outside the data range opens NOTHING
    val empty = CorpusSink.zOrderedScan(spark, dir,
      (umax + 10, umax + 20), dR)
    assert(empty.count() == 0L)
  }
}
