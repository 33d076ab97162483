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
  * Paths that run their OWN actions (e.g. Dedup.components' round loop)
  * release their caches with try/finally instead and never appear here.
  */
object Caches {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and remember it for the next [[release]]. Idempotent: a
    * plan the cache manager already holds (e.g. the same builder invoked
    * twice before a release) is not re-cached or double-registered. */
  def track(df: DataFrame): DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      reg.add(df.cache())
    }
    df
  }

  /** Unpersist every tracked cache (non-blocking). Safe to call when
    * nothing is tracked; safe to call repeatedly. */
  def release(): Unit = {
    var d = reg.poll()
    while (d != null) {
      d.unpersist(false)
      d = reg.poll()
    }
  }
}
