package graft

import org.apache.spark.sql.functions._
import graft.plans.AsofJoin

/** The native as-of join operator (logical node + strategy + sort-merge
  * exec, SURVEY §7.3 (c)): agrees row-for-row with the composed
  * union+window formulation (q57), plans as one exchange + sort per
  * side feeding AsofJoinExec, and resolves duplicate right timestamps
  * to the max tiebreak. */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def sides = {
    val ev = Tables.events(spark, sfDir).withColumn("tsu", unix_micros(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tsu"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cuser"), col("tsu").as("click_tsu"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    (p, c)
  }

  private def nativeJoin = {
    val (p, c) = sides
    AsofJoin(spark, p, c, "user_id", "cuser", "tsu", "click_tsu", "click_id")
  }

  test("native as-of join agrees with the union+window formulation (q57)") {
    val nat = nativeJoin.collect()
      .map { r =>
        val cid = if (r.isNullAt(6)) None else Some(r.getLong(6))
        val ctsu = if (r.isNullAt(5)) None else Some(r.getLong(5))
        r.getLong(2) -> ((cid, ctsu))
      }.toMap
    val composed = SparkEntry.queries("q57_asof_join")(spark, sfDir).collect()
      .map { r =>
        val cid = if (r.isNullAt(4)) None else Some(r.getLong(4))
        val ctsu = if (r.isNullAt(5)) None else Some(r.getLong(5))
        r.getLong(0) -> ((cid, ctsu))
      }.toMap
    assert(nat.nonEmpty && nat == composed)
  }

  test("plan shape: AsofJoinExec fed by one exchange + sort per side, no window machinery") {
    val plan = nativeJoin.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(600)) // nodeName renders without the Exec suffix
    assert(!plan.contains("Window"), "native operator must not fall back to the window plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan.take(1200))
  }

  test("duplicate right timestamps resolve to the max tiebreak row") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 50L, 1L, 1.0), (1L, 50L, 3L, 3.0), (1L, 50L, 2L, 2.0))
      .toDF("rk", "rts", "rid", "rv")
    val out = AsofJoin(spark, left, right, "k", "rk", "ts", "rts", "rid").collect()
    assert(out.length == 1)
    assert(out.head.getLong(5) == 3L && out.head.getDouble(6) == 3.0)
  }

  test("composite 2-part key: matched on BOTH columns, not a prefix") {
    val left = Seq((1L, 1L, 100L, 10L), (1L, 2L, 100L, 11L), (2L, 1L, 100L, 12L))
      .toDF("k1", "k2", "ts", "lid")
    val right = Seq(
      (1L, 1L, 50L, 1L, 1.0),
      (1L, 2L, 60L, 2L, 2.0),
      (2L, 2L, 40L, 3L, 3.0)) // same k1 as lid 12 but different k2 — no match
      .toDF("rk1", "rk2", "rts", "rid", "rv")
    val out = AsofJoin(spark, left, right, Seq("k1", "k2"), Seq("rk1", "rk2"), "ts", "rts", "rid")
      .collect().map(r => r.getLong(3) -> (if (r.isNullAt(7)) -1L else r.getLong(7))).toMap
    assert(out == Map(10L -> 1L, 11L -> 2L, 12L -> -1L))
  }

  test("composite key agrees with the DuckDB multi-key ASOF contract on a randomized feed") {
    // deterministic pseudo-random feed over a 3x3 composite key domain
    // with deliberate ts collisions (mod 17)
    def h(i: Long, salt: Long) = (i * 2654435761L + salt) & 0x7fffffff
    val left = (0L until 200L).map(i => (h(i, 1) % 3, h(i, 2) % 3, h(i, 3) % 17, i))
      .toDF("k1", "k2", "ts", "lid")
    val right = (0L until 150L).map(i => (h(i, 4) % 3, h(i, 5) % 3, h(i, 6) % 17, i))
      .toDF("rk1", "rk2", "rts", "rid")
    val got = AsofJoin(spark, left, right, Seq("k1", "k2"), Seq("rk1", "rk2"), "ts", "rts", "rid")
      .collect().map(r => r.getLong(3) -> (if (r.isNullAt(7)) -1L else r.getLong(7))).toMap
    // reference: per left row, the right row with max (rts, rid) among
    // rk1=k1 AND rk2=k2 AND rts < ts — DuckDB's ASOF JOIN ... USING
    // (k1, k2) with strict inequality and max-tiebreak determinism
    val rrows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = left.collect().map { l =>
      val (k1, k2, ts, lid) = (l.getLong(0), l.getLong(1), l.getLong(2), l.getLong(3))
      val m = rrows.filter(r => r._1 == k1 && r._2 == k2 && r._3 < ts)
      lid -> (if (m.isEmpty) -1L else m.maxBy(r => (r._3, r._4))._4)
    }.toMap
    assert(got == exp)
    assert(got.values.exists(_ >= 0) && got.values.exists(_ == -1L), "feed exercises both outcomes")
  }

  test("strictness and missing-match semantics on a constructed feed") {
    val left = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 12L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 100L, 1L, 1.0), (1L, 60L, 2L, 2.0), (3L, 5L, 4L, 4.0))
      .toDF("rk", "rts", "rid", "rv")
    val out = AsofJoin(spark, left, right, "k", "rk", "ts", "rts", "rid").collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    // lid 10 (ts 100): click at ts 100 is NOT eligible (strict <) -> rid 2 (ts 60)
    // lid 11 (ts 50): no strictly-earlier right row -> null
    // lid 12 (key 2): key has no right rows at all -> null
    assert(out == Map(10L -> 2L, 11L -> -1L, 12L -> -1L))
  }
}
