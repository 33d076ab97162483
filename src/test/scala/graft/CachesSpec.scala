package graft

import org.apache.spark.storage.StorageLevel

/** The library cache-hygiene contract: operators mark shared subtrees
  * with Caches.track, the consuming entry point calls Caches.release —
  * nothing stays pinned afterwards. */
class CachesSpec extends SparkTestBase {
  import spark.implicits._

  test("track caches, release unpersists, and track is idempotent") {
    Caches.release() // isolate from other suites
    def build() = Seq(1, 2, 3).toDF("x").select($"x" * 2 as "y")
    val df = build()
    val tracked = Caches.track(df)
    assert(tracked eq df, "track returns the same frame")
    assert(df.storageLevel != StorageLevel.NONE, "track must cache")
    assert(Caches.trackedCount == 1)
    // idempotent on the REAL re-entry shape: the same builder invoked
    // again yields a structurally-equal (not identical) plan, which the
    // cache manager already holds — it must not re-cache or re-register
    val again = build()
    Caches.track(again)
    Caches.track(df)
    assert(Caches.trackedCount == 1, "equal plans must not double-register")
    assert(again.storageLevel != StorageLevel.NONE, "equal plan reads the same cache")
    df.count()
    Caches.release()
    assert(df.storageLevel == StorageLevel.NONE, "release must unpersist")
    assert(Caches.trackedCount == 0)
    // release with nothing tracked is a no-op
    Caches.release()
  }

  test("query builders leave no pinned cache behind after release") {
    spark.catalog.clearCache() // start from a clean cache manager
    val q = graft.queries.Similarity.queries("q39_cosine_neardup")(spark, sfDir)
    q.write.format("noop").mode("overwrite").save()
    Caches.release()
    assert(spark.sharedState.cacheManager.isEmpty,
      "cache manager still holds relations after release")
  }
}
