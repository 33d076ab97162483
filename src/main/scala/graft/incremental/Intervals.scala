package graft.incremental

import java.sql.Timestamp
import org.apache.spark.sql.Column

/** Time-interval semantics (P6/F9/D4). The reference deliberately mixes two
  * interval conventions and an off-by-one here silently duplicates or drops
  * boundary rows under the delete-then-insert replay contract (SURVEY §7.4):
  *  - replication deletes/copies `(s, e]` on endtime/tstamp
  *    (reference dbs/nikon.py:117-145,227-229,244-245);
  *  - ROT analytics reads `[s, e)` on tstamp
  *    (reference dbs/nikon.py:111-112, R/pg_db.R:24-25).
  */
object Intervals {

  sealed trait Convention {
    def contains(c: Column, s: Column, e: Column): Column
    final def contains(c: Column, s: Timestamp, e: Timestamp): Column =
      contains(c, org.apache.spark.sql.functions.lit(s), org.apache.spark.sql.functions.lit(e))
  }

  /** `(s, e]` — replication/delete convention. */
  case object OpenClosed extends Convention {
    def contains(c: Column, s: Column, e: Column): Column = c > s && c <= e
  }

  /** `[s, e)` — analytics read convention. */
  case object ClosedOpen extends Convention {
    def contains(c: Column, s: Column, e: Column): Column = c >= s && c < e
  }

  /** Day-sized chunking of a watermark interval (reference
    * nikon_ETL.py:463-466: advance in ≤86400 s steps; :458-461 caps the
    * loop at 30 iterations per run). Returns consecutive (chunkStart,
    * chunkEnd] bounds; the final chunk is clamped to `end`. */
  def chunks(start: Timestamp, end: Timestamp,
             stepSeconds: Long = 86400L, maxChunks: Int = 30): Seq[(Timestamp, Timestamp)] = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val out = Seq.newBuilder[(Timestamp, Timestamp)]
    var s = start.getTime
    var i = 0
    while (s < end.getTime && i < maxChunks) {
      val e = math.min(s + stepSeconds * 1000L, end.getTime)
      out += ((new Timestamp(s), new Timestamp(e)))
      s = e
      i += 1
    }
    out.result()
  }
}
