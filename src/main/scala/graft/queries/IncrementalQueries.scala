package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.incremental.{IncrementalRunner, Intervals}

/** Oracle-checkable faces of the incremental module (M3). The stateful
  * pieces — slice overwrite, watermark advance, replay idempotence — are
  * actions, exercised in IncrementalSpec; the queries here pin down the
  * exact relational semantics each chunk computes.
  */
object IncrementalQueries extends QueryModule {

  // ---------------------------------------------------------------------
  // q23 — one replication chunk (D4 + K3 + clean_endtimedata, reference
  // nikon_ETL.py:170-182,338-377): rows in the watermark interval (s, e]
  // (the replication convention, dbs/nikon.py:227-229), projected onto the
  // fixed sink column order with a LOGIN_TIME stamp. The reference stamps
  // datetime.now(); here the batch time is a parameter (fixed literal) so
  // the chunk is replayable byte-for-byte — same determinism the D5
  // contract needs anyway.
  private val batchTime = Timestamp.valueOf("2024-02-01 00:00:00")
  private val wmStart = Timestamp.valueOf("2024-01-10 00:00:00")
  private val wmEnd = Timestamp.valueOf("2024-01-11 00:00:00") // one 86400 s chunk

  private def q23(s: SparkSession, dir: String): DataFrame = {
    val chunk = Intervals.chunks(wmStart, wmEnd).head
    // eventsInterval pushes a widened raw-ns predicate into the parquet
    // scan (row-group pruning) and applies the exact (s, e] residual.
    val slice = Tables.eventsInterval(s, dir, chunk._1, chunk._2, Intervals.OpenClosed)
    IncrementalRunner.cleanEndtimeData(
      slice, Seq("event_id", "user_id", "event_type", "ts"), batchTime)
      .orderBy("event_id")
  }

  private val q23Sql =
    """SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts,
      |       TIMESTAMP '2024-02-01 00:00:00' AS "LOGIN_TIME"
      |FROM events
      |WHERE ts > TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-11 00:00:00'
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q24 — the candidate-tools-per-window query driving the rot loop
  // (A3 + J4 + P6 + F1, reference dbs/nikon.py:75-105 inside the D4 window
  // loop at nikon_ETL.py:452-488): per 86400 s chunk of the interval,
  // which distinct whitelisted entities have data. The chunk boundaries
  // come from the same Intervals.chunks used by the runner, inlined as a
  // literal relation (driver-side bounds, exactly like the reference's
  // window loop variables).
  private def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lo = Timestamp.valueOf("2024-01-05 00:00:00")
    val hi = Timestamp.valueOf("2024-01-09 00:00:00")
    val windows = Intervals.chunks(lo, hi)
      .zipWithIndex.map { case ((cs, ce), i) => (i + 1, cs, ce) }
      .toDF("window_id", "w_start", "w_end")
    val ev = Tables.events(s, dir)
    ev.join(broadcast(windows),
        Intervals.OpenClosed.contains(col("ts"), col("w_start"), col("w_end")))
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("window_id"), upper(col("event_type")).as("etype"), col("user_id"))
      .distinct()
      .groupBy("window_id", "etype")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("window_id", "etype")
  }

  private val q24Sql =
    """WITH windows AS (
      |  SELECT i + 1 AS window_id,
      |         TIMESTAMP '2024-01-05 00:00:00' + INTERVAL (i) DAY AS w_start,
      |         TIMESTAMP '2024-01-05 00:00:00' + INTERVAL (i + 1) DAY AS w_end
      |  FROM range(4) t(i))
      |SELECT window_id, upper(event_type) AS etype, COUNT(DISTINCT user_id) AS n_users
      |FROM events e JOIN windows w ON e.ts > w.w_start AND e.ts <= w.w_end
      |WHERE event_type IN ('purchase', 'signup')
      |GROUP BY window_id, etype ORDER BY window_id, etype""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_replication_chunk" -> (q23 _),
    "q24_window_candidates" -> (q24 _),
  )

  override val oracle: Map[String, String] = Map(
    "q23_replication_chunk" -> q23Sql,
    "q24_window_candidates" -> q24Sql,
  )
}
