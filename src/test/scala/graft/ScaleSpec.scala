package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._

/** Scale techniques the 100 TB deployment leans on, demonstrated and
  * locked in: bucketed tables co-locate their join (no Exchange in the
  * plan), and salted joins produce exactly the plain join's result. */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle (co-located SMJ)") {
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS or_bkt")
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bkt")
    Tables.orders(spark, sfDir).select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("or_bkt")

    // disable auto-broadcast so the sort-merge path (the 100 TB shape,
    // where neither side fits in memory) is what gets planned
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt").join(spark.table("or_bkt"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin"), "expected co-located SMJ")
      // and it is still correct
      val expect = Tables.lineitem(spark, sfDir).select("l_orderkey")
        .join(Tables.orders(spark, sfDir).select(col("o_orderkey").as("l_orderkey")), "l_orderkey")
        .count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE li_bkt"); spark.sql("DROP TABLE or_bkt")
    }
  }

  test("salted join equals the plain join (inner and left)") {
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("k"), col("l_quantity"))
    val or = Tables.orders(spark, sfDir).select(col("o_orderkey").as("k"), col("o_totalprice"))
    for (jt <- Seq("inner", "left")) {
      val plain = li.join(or, Seq("k"), jt)
      val salted = Skew.saltedJoin(li, or, "k", salt = 8, joinType = jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"$jt salted join diverged")
    }
  }

  test("AQE is enabled in the harness sessions") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("date-partitioned layout gets partition pruning (the 100 TB fact layout)") {
    // The production layout for the time-windowed fact tables: parquet
    // partitioned by event date, so interval scans prune whole
    // directories before any row-group I/O.
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events_by_day"
    Tables.events(spark, sfDir)
      .withColumn("d", to_date(col("ts")))
      .write.partitionBy("d").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("d") === "2024-01-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*2024-01-03.*"),
      s"no partition pruning:\n${plan.take(1200)}")
    // pruning must not change results
    val expect = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) === "2024-01-03").count()
    assert(pruned.count() == expect && expect > 0)
  }
}
