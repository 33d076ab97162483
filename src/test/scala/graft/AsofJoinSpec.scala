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
