package graft

import org.apache.spark.storage.StorageLevel

/** The library cache-hygiene contract: operators mark shared subtrees
  * with Caches.track, the consuming entry point calls Caches.release —
  * nothing stays pinned afterwards. */
class CachesSpec extends SparkTestBase {
  import spark.implicits._

  test("track caches, release unpersists, and track is idempotent") {
    Caches.release() // isolate from other suites
    val df = Seq(1, 2, 3).toDF("x").select($"x" * 2 as "y")
    val tracked = Caches.track(df)
    assert(tracked eq df, "track returns the same frame")
    assert(df.storageLevel != StorageLevel.NONE, "track must cache")
    // idempotent: tracking an already-cached plan must not re-register
    Caches.track(df.sparkSession.createDataFrame(df.rdd, df.schema))
    Caches.track(df)
    df.count()
    Caches.release()
    assert(df.storageLevel == StorageLevel.NONE, "release must unpersist")
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
