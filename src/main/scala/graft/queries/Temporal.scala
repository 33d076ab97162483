package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Temporal join operators over the `events` stream — the two join shapes
  * Spark has no native operator for, each expressed the way it should run
  * at 100 TB (SURVEY.md §2.11 L23/L24; the time-window discipline extends
  * the reference's interval conventions, `nikon_ETL.py:463-466`).
  *
  * - AS-OF join (q60): match each row to the latest earlier row of another
  *   stream. The scale-correct Spark phrasing is NOT a join at all: union
  *   the two streams, ONE shuffle on the entity key, and carry the other
  *   stream's last value forward with a running window (`last(..,
  *   ignoreNulls)` over rows-preceding). A join-based as-of would shuffle
  *   both inputs AND need a per-row inequality probe; the union form is a
  *   single sort-merge pass and is how kdb/Flink implement it.
  * - RANGE join (q61): rows falling inside derived time intervals. A naive
  *   inequality join is a cartesian product per entity; instead both sides
  *   are bucketed to fixed bins sized == the interval length, so every
  *   interval spans at most 2 bins — candidate generation becomes an
  *   EQUI-join on (entity, bin) with the exact bounds as a residual
  *   predicate. Bin width pinned to window length keeps the blow-up factor
  *   at exactly 2 regardless of scale.
  *
  * Time arithmetic is integer microseconds throughout (`unix_micros` /
  * DuckDB `epoch_us`) — exact in both engines, no floating-point epochs
  * (same discipline as q25's sessionization).
  */
object Temporal extends QueryModule {

  /** Blackout window length: 10 minutes in microseconds. */
  private val WindowUs = 600000000L

  // ---------------------------------------------------------------------
  // q60 — AS-OF join: every 'click' event matched to the most recent
  // strictly-preceding 'error' event of the same user (time-since-last-
  // failure, the standard telemetry as-of). "Preceding" is the total
  // order (ts, event_id), so ties are deterministic in both engines.
  // Clicks with no prior error are dropped (inner as-of).
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("tsu"))
      .withColumn("err_tsu", when(col("event_type") === "error", col("tsu")))
      .withColumn("last_err", last(col("err_tsu"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click" && col("last_err").isNotNull)
      .select(col("event_id"), col("user_id"),
              (col("tsu") - col("last_err")).as("gap_us"))
      .orderBy("event_id")
  }

  private val q60Sql =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu FROM events),
      |marked AS (
      |  SELECT *, last_value(CASE WHEN event_type = 'error' THEN tsu END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_err
      |  FROM ev)
      |SELECT event_id, user_id, tsu - last_err AS gap_us
      |FROM marked WHERE event_type = 'click' AND last_err IS NOT NULL
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q61 — RANGE join: per user, count 'view' events falling inside ANY
  // 10-minute blackout window [error_ts, error_ts + 10min) opened by that
  // user's 'error' events. EXISTS semantics (a view inside two overlapping
  // blackouts counts once), realized as a LEFT SEMI join. Candidates come
  // from an equi-join on (user_id, bin): each error contributes its
  // window's (at most) two covering bins, so corpus bytes shuffle once on
  // a uniform composite key and the inequality is only a residual.
  private def q61(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsu"))
    val views = ev.filter(col("event_type") === "view")
      .withColumn("bin", expr(s"tsu div ${WindowUs}L"))
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("tsu").as("etsu"),
              explode(array(expr(s"tsu div ${WindowUs}L"),
                            expr(s"tsu div ${WindowUs}L + 1L"))).as("bin"))
    views.join(errs,
        views("user_id") === errs("e_user") && views("bin") === errs("bin") &&
        views("tsu") >= errs("etsu") && views("tsu") < errs("etsu") + WindowUs,
        "left_semi")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_blackout_views"))
      .orderBy("user_id")
  }

  private val q61Sql =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events)
      |SELECT v.user_id, COUNT(*) AS n_blackout_views
      |FROM ev v
      |WHERE v.event_type = 'view' AND EXISTS (
      |  SELECT 1 FROM ev e
      |  WHERE e.user_id = v.user_id AND e.event_type = 'error'
      |    AND v.tsu >= e.tsu AND v.tsu < e.tsu + $WindowUs)
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin

  // ---------------------------------------------------------------------

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_asof_join"  -> (q60 _),
    "q61_range_join" -> (q61 _),
  )

  override val oracle: Map[String, String] = Map(
    "q60_asof_join"  -> q60Sql,
    "q61_range_join" -> q61Sql,
  )
}
