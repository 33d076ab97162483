package graft

import org.apache.spark.sql.DataFrame

/** Registry for the temporary caches query builders create (shared
  * subtrees like shingle sets or quantized vectors that one query reads
  * several times). A builder marks a DataFrame with [[track]] instead of
  * a bare `.cache()`; whoever RUNS the returned query calls [[release]]
  * once the action finishes. This closes the leak a bare cache has for
  * API users composing operators: the cache manager would otherwise pin
  * executor memory until `spark.catalog.clearCache()` nukes everyone's
  * caches, not just this library's.
  *
  * The registry is THREAD-LOCAL: release() drops only the caches the
  * calling thread's builders tracked, so concurrent queries sharing one
  * SparkSession cannot unpersist each other's in-flight relations. The
  * contract is build-and-consume on one thread (how Bench, Verify,
  * RotRunner, and a composing API caller all run); a builder whose
  * consumer runs on a different thread should release on the building
  * thread after the consuming action completes.
  *
  * Paths that run their OWN actions (e.g. Dedup.components' round loop)
  * release their caches with try/finally instead and never appear here.
  */
object Caches {
  private val reg = ThreadLocal.withInitial(
    () => new java.util.ArrayDeque[DataFrame]())
  private val off = ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Run `body` with tracking DISABLED on this thread: [[track]] returns
    * its argument unpersisted. For PLAN INTROSPECTION (PlanSpec's
    * catalog-wide sweeps): the cache manager substitutes an
    * InMemoryRelation for every persisted subtree, which hides the
    * subtree's operators from a plain plan traversal — a banned
    * cartesian or partition-less window inside a cached build would
    * pass a sweep silently. With tracking off the full tree is visible
    * to one ordinary traversal. Queries built this way recompute shared
    * subtrees if actually executed — introspect, don't run. */
  def disabled[A](body: => A): A = {
    val prev = off.get() // restore, don't clear: nested scopes must not
    off.set(java.lang.Boolean.TRUE) // re-enable tracking for their parent
    try body finally off.set(prev)
  }

  /** Cache `df` and remember it for this thread's next [[release]].
    * Idempotent: a plan the cache manager already holds (e.g. the same
    * builder invoked twice before a release) is not re-cached or
    * double-registered. `level` defaults to `.cache()`'s
    * MEMORY_AND_DISK; pass DISK_ONLY for relations that are large,
    * cheap to scan back, and expensive to recompute (the LSH band
    * relation between its count and collect passes). */
  def track(df: DataFrame,
            level: org.apache.spark.storage.StorageLevel =
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    if (off.get()) return df // introspection scope: no cache substitution
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      reg.get().add(df.persist(level))
    }
    df
  }

  /** Number of caches this thread currently has registered (test hook). */
  private[graft] def trackedCount: Int = reg.get().size()

  /** Unpersist every cache tracked by THIS thread (non-blocking). Safe
    * to call when nothing is tracked; safe to call repeatedly. */
  def release(): Unit = {
    val q = reg.get()
    var d = q.poll()
    while (d != null) {
      d.unpersist(false)
      d = q.poll()
    }
  }
}
