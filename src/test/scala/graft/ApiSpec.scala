package graft

import graft.api.QueryApi
import org.apache.spark.sql.functions._

/** The interactive query API: both physical strategies agree (the
  * reference's own correctness harness, eda_query.py:240-257), the
  * pipeline chains, and the map-shaped edge result groups correctly. */
class ApiSpec extends SparkTestBase {
  import spark.implicits._

  private def ids = Seq(1L, 7L, 13L, 25L).toDF("id")

  test("glass_raw_data: subquery and decorrelated strategies return the same relation") {
    val a = QueryApi.glassRawData(spark, sfDir, ids, subquery = true)
    val b = QueryApi.glassRawData(spark, sfDir, ids, subquery = false)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("history → data pipeline chains on the history keys") {
    val hist = QueryApi.glassHistory(spark, sfDir, ids)
    assert(hist.count() > 0)
    assert(hist.select("glass_id").distinct().as[Long].collect().toSet
      .subsetOf(Set(1L, 7L, 13L, 25L)))
    val data = QueryApi.glassData(spark, sfDir, hist)
    // every detail row's (glass, step) came from the history
    val hKeys = hist.select("glass_id", "step_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    data.select("glass_id", "step_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .foreach(k => assert(hKeys.contains(k)))
  }

  test("grouped edge result: one entry per glass, rows preserved") {
    val hist = QueryApi.glassHistory(spark, sfDir, ids)
    val m = QueryApi.grouped(hist, "glass_id").collect().toMap
    assert(m.keySet == hist.select("glass_id").distinct().as[Long].collect().toSet)
    assert(m.values.map(_.size).sum == hist.count())
  }
}
