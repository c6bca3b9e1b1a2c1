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
  // Plain strong map, purged of STOPPED sessions on every ledger touch
  // (round-17 advice: the previous WeakHashMap's weak-key design was
  // self-defeating — each tracked Dataset strongly references its
  // SparkSession, so the values pinned the key and no entry was ever
  // collectable. Weak VALUES would be worse: the downstream frames a
  // builder returns hold logical plans, not the persisted Dataset
  // object, so a live session's tracked frame could be collected
  // before release() and its cache entry leak un-unpersistable).
  // Lifecycle contract: for a LIVE session, release() is the mandatory
  // teardown. A session stopped WITHOUT release() is swept here on the
  // next persist/release/trackedCount call from any session — its
  // executor-side cache died with the session; the sweep just drops
  // the driver-side ledger refs so they don't outlive it.
  private val tracked =
    scala.collection.mutable.HashMap
      .empty[SparkSession, scala.collection.mutable.Buffer[DataFrame]]

  private def sweepStopped(): Unit = sweep(_.sparkContext.isStopped)

  /** Drop every ledger entry whose session `stopped` reads as dead.
    * The production predicate is `sparkContext.isStopped`; the
    * predicate is a parameter only so CachesSpec can pin the sweep
    * without stopping the suite's shared context.
    */
  private[graft] def sweep(stopped: SparkSession => Boolean): Unit =
    synchronized { tracked.filterInPlace((s, _) => !stopped(s)) }

  /** Persist `df` at MEMORY_AND_DISK exactly once per canonical plan
    * per session, tracking it for [[release]]; a no-op (no warning) if
    * an equivalent plan is already cached.
    */
  def persist(df: DataFrame): DataFrame = synchronized {
    sweepStopped()
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      tracked.getOrElseUpdate(df.sparkSession,
        scala.collection.mutable.Buffer.empty) += df
    }
    df
  }

  /** Number of frames currently tracked for `spark` (spec hook). */
  def trackedCount(spark: SparkSession): Int = synchronized {
    sweepStopped()
    tracked.get(spark).map(_.size).getOrElse(0)
  }

  /** Unpersist every frame [[persist]] cached in this session — the
    * teardown a library caller invokes after consuming a built query's
    * result. Non-blocking; safe to call twice.
    */
  def release(spark: SparkSession): Unit = synchronized {
    val frames = tracked.remove(spark)
    if (!spark.sparkContext.isStopped)
      frames.foreach(_.foreach(_.unpersist(blocking = false)))
    sweepStopped()
  }

  /** `df.persistTracked` sugar so builder call sites stay postfix. */
  implicit final class TrackedPersist(private val df: DataFrame)
      extends AnyVal {
    def persistTracked: DataFrame = Caches.persist(df)
  }
}
