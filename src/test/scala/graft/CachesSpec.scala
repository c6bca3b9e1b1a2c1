package graft

import org.apache.spark.storage.StorageLevel

/** The tracked-persist ledger (round-16 advice, medium): builders
  * persist shared intermediates through [[Caches]] so library callers
  * have a teardown path and identical-plan double-persists are silent
  * no-ops instead of CacheManager warnings.
  */
class CachesSpec extends SparkSuite {
  import spark.implicits._

  test("persist caches once, double-persist of the same plan is a no-op") {
    spark.sharedState.cacheManager.clearCache()
    Caches.release(spark)
    val a = Seq(1, 2, 3).toDF("x").filter($"x" > 1)
    // a SECOND DataFrame with the SAME canonical plan — the shape that
    // produced the 515 `Asked to cache already cached data` warnings
    val b = Seq(1, 2, 3).toDF("x").filter($"x" > 1)
    try {
      Caches.persist(a)
      assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
      val before = Caches.trackedCount(spark)
      Caches.persist(b) // must neither warn nor re-track
      assert(Caches.trackedCount(spark) == before,
        "identical-plan re-persist was tracked twice")
      assert(b.storageLevel == StorageLevel.MEMORY_AND_DISK,
        "cache lookup is canonical-plan-keyed, b should read as cached")
    } finally Caches.release(spark)
  }

  test("release unpersists every tracked frame (library-caller teardown)") {
    spark.sharedState.cacheManager.clearCache()
    Caches.release(spark)
    val a = Caches.persist(Seq(1, 2).toDF("x"))
    val b = Caches.persist(Seq(3, 4).toDF("y"))
    assert(Caches.trackedCount(spark) == 2)
    Caches.release(spark)
    assert(Caches.trackedCount(spark) == 0)
    assert(a.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel == StorageLevel.NONE)
    // idempotent
    Caches.release(spark)
  }

  test("a stopped session's ledger entry is swept on the next touch (round-17 advice)") {
    spark.sharedState.cacheManager.clearCache()
    Caches.release(spark)
    Caches.persist(Seq(1, 2).toDF("x"))
    assert(Caches.trackedCount(spark) == 1)
    // simulate THIS session's context reading as stopped (the real
    // predicate is sparkContext.isStopped — stopping the suite's
    // shared context here would kill every later suite in the JVM):
    // the entry must drop from the ledger instead of being pinned for
    // the JVM lifetime, which the old WeakHashMap design never did
    // (its Buffer[DataFrame] values strongly referenced the key).
    // The predicate matches this suite's session ONLY (round-18
    // advice): sweep(_ => true) would also untrack every concurrent
    // suite's frames mid-test — sbt runs suites in parallel in one
    // JVM — turning their release() into a no-op and flaking their
    // ledger assertions.
    Caches.sweep(_ eq spark)
    assert(Caches.trackedCount(spark) == 0,
      "stopped session's ledger entry survived the sweep")
    // the sweep drops driver-side refs only; this session is really
    // live, so clean its cache for the next test
    spark.sharedState.cacheManager.clearCache()
  }

  test("a catalog build's caches are fully releasable without clearCache") {
    spark.sharedState.cacheManager.clearCache()
    Caches.release(spark)
    // q125_bm25 persists two intermediates (tokenized corpus, postings)
    val df = queries.Catalog.all("q125_bm25").build(spark, sf())
    df.write.format("noop").mode("overwrite").save()
    assert(Caches.trackedCount(spark) >= 1,
      "builder persists must route through the tracked ledger")
    Caches.release(spark)
    assert(Caches.trackedCount(spark) == 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "release() left cached relations behind")
  }
}
