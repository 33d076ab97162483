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

  test("q36 brute ANN plan broadcasts the query set and never shuffles on pos") {
    // The round-3 regression: a position-explode equi-join shuffled the
    // corpus ×64 on a 64-value key. The plan contract is: corpus bytes
    // cross the wire only for the per-vector roll-up; the query side is
    // a broadcast; `pos` is never a partitioning key.
    val plan = graft.queries.Similarity.queries("q36_ann_bruteforce")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(pos"),
      s"corpus shuffled on pos:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      s"query vectors not broadcast:\n${plan.take(1500)}")
  }

  test("components resolves clique-shaped dup groups in a one-round label loop, exactly") {
    // The workload shape dedup produces: dense near-clique groups. The
    // double contraction must collapse them so the label loop is a
    // single verification round — the per-round driver floor is what
    // made the round-3 loop 48% of the whole bench, so the ROUND COUNT
    // is the contract, not just the result.
    val pairs = (0 until 100).flatMap { c =>
      val base = c * 1000L
      // chain + chords: connected, denser than a path, not a pure star
      (1 until 20).map(i => (base + i - 1, base + i)) ++
        (7 until 20 by 6).map(i => (base, base + i))
    }.toDF("d1", "d2").repartition(8)
    val out = graft.queries.Dedup.components(pairs).collect()
    assert(out.length == 100 * 20)
    out.foreach { r =>
      assert(r.getLong(1) == (r.getLong(0) / 1000L) * 1000L,
        s"node ${r.getLong(0)} labeled ${r.getLong(1)}")
    }
    val rounds = graft.queries.Dedup.lastRounds
    assert(rounds >= 1 && rounds <= 3,
      s"contraction should leave ~1 verification round, took $rounds")
  }

  test("components is exact on an adversarial-diameter path graph") {
    // A 5000-node path scattered over partitions is the worst case for
    // local contraction (almost nothing co-locates): the loop must still
    // produce the exact transitive labeling, whatever the round count.
    val pairs = (0L until 4999L).map(i => (i, i + 1)).toDF("d1", "d2")
      .repartition(16)
    val out = graft.queries.Dedup.components(pairs).collect()
    assert(out.length == 5000)
    assert(out.forall(_.getLong(1) == 0L), "path graph must collapse to root 0")
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
