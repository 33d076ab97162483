package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming expression of the incremental dataflow (M5,
  * SURVEY §7.2): the reference's watermark batch loop (D4, reference
  * nikon_ETL.py:425-499 — read watermark, process ≤86400 s windows,
  * advance) is exactly Spark's event-time watermark + tumbling window.
  * The driver-side chunk loop of graft.incremental.IncrementalRunner and
  * these streaming jobs share semantics: one is replayed micro-batches
  * over parquet, the other continuous micro-batches over a stream — the
  * same aggregation body (the K9 summary) runs in both.
  *
  * Scale: state is bounded by the watermark (late data beyond 1 day is
  * dropped, matching the batch loop's day-chunk replay contract); the
  * window aggregation is a streaming partial agg keyed by (window,
  * event_type) — no unbounded state, no driver collection.
  */
object Streams {

  /** D4/K9 as a stream: per-day per-type event summary with a 1-day
    * event-time watermark. Output mode append once a window closes. */
  def windowedSummary(events: DataFrame): DataFrame = {
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
              col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming storage sink with the D5 replay contract: every
    * micro-batch overwrites its own `batch=<id>` partition, so a batch
    * replayed after a failure (same epoch id from the checkpoint)
    * rewrites its partition instead of appending duplicates — the
    * streaming twin of SliceStore.overwriteSlice / RotRunner's chunk
    * partitions. Combined with a checkpointLocation this is end-to-end
    * exactly-once onto plain parquet. */
  def startPartitionedSink(df: DataFrame, path: String,
                           checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$path/batch=$id")
      }
      .start()
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, value: Double)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Int, total_value: Double)

  /** Custom per-key streaming state (the Structured Streaming analog of
    * the reference's per-tool incremental state K6): gap-based
    * sessionization with flatMapGroupsWithState — a session closes after
    * `gapMinutes` of event-time silence, enforced via event-time timeout
    * so state is watermark-bounded. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.value))
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var closed = Vector.empty[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t >= s.start - gapMs && t - s.last <= gapMs =>
              // out-of-order (non-late) events may precede the session
              // start — extend both bounds, not just the end; the lower
              // bound keeps an event more than a gap BEFORE the session
              // from being absorbed (batch semantics split there)
              cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t),
                s.n + 1, s.value + e.value))
            case Some(s) if t < s.start - gapMs =>
              // earlier than the open session by more than a gap: it is
              // its own (already-closed) session, the open one stands
              closed :+= Session(userId, new Timestamp(t), new Timestamp(t), 1, e.value)
            case Some(s) =>
              closed :+= Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.value)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        closed.iterator
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
