package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Tracked persist for the query builders (round-16 advice, medium).
  *
  * The catalog's builders persist ~65 shared intermediates
  * (MEMORY_AND_DISK) so a fact subtree referenced from two arms of one
  * query materializes once — the round-16 recompute purge. Two problems
  * with raw `df.persist(...)` at those sites:
  *
  *  1. **No teardown path.** The caller gets back a downstream
  *     DataFrame and has no handle to the persisted frame; short of
  *     `cacheManager.clearCache()` a long-lived session accumulates a
  *     corpus-derived cached relation per build. [[persist]] records
  *     every frame it caches, and [[release]] unpersists them all —
  *     the library-caller teardown. Bench/Verify keep their
  *     clearCache-between-builds discipline (strictly stronger).
  *  2. **Double-persist warnings.** Some intermediates are persisted by
  *     more than one construction site (a helper and its caller, or a
  *     second build of the same entry in one JVM), producing 500+
  *     harmless-but-noisy `Asked to cache already cached data` warnings
  *     per suite run that bury real cache bugs. [[persist]] gates on
  *     `storageLevel == NONE` — the same canonicalized-plan lookup the
  *     CacheManager's warning uses — so the already-cached case is a
  *     silent no-op.
  *
  * Thread-safe: the check-then-persist is atomic under this object's
  * lock (builders may run from concurrent test suites).
  */
object Caches {
  // WeakHashMap on the session key: a stopped-and-dropped session's
  // ledger must not pin its DataFrames for the JVM lifetime
  private val tracked =
    scala.collection.mutable.WeakHashMap
      .empty[SparkSession, scala.collection.mutable.Buffer[DataFrame]]

  /** Persist `df` at MEMORY_AND_DISK exactly once per canonical plan
    * per session, tracking it for [[release]]; a no-op (no warning) if
    * an equivalent plan is already cached.
    */
  def persist(df: DataFrame): DataFrame = synchronized {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      tracked.getOrElseUpdate(df.sparkSession,
        scala.collection.mutable.Buffer.empty) += df
    }
    df
  }

  /** Number of frames currently tracked for `spark` (spec hook). */
  def trackedCount(spark: SparkSession): Int = synchronized {
    tracked.get(spark).map(_.size).getOrElse(0)
  }

  /** Unpersist every frame [[persist]] cached in this session — the
    * teardown a library caller invokes after consuming a built query's
    * result. Non-blocking; safe to call twice.
    */
  def release(spark: SparkSession): Unit = synchronized {
    tracked.remove(spark).foreach(_.foreach(_.unpersist(blocking = false)))
  }

  /** `df.persistTracked` sugar so builder call sites stay postfix. */
  implicit final class TrackedPersist(private val df: DataFrame)
      extends AnyVal {
    def persistTracked: DataFrame = Caches.persist(df)
  }
}
