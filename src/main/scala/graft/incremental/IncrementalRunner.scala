package graft.incremental

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental watermark batch loop (D4/D5/D6, reference
  * `ETL.etl`/`ETL.rot` at nikon_ETL.py:293-336,425-499): read the
  * watermark, process (last, now] in ≤86400 s chunks (≤30 per run), write
  * each chunk idempotently via slice overwrite, advance the watermark
  * after the data lands (ordering contract nikon_ETL.py:327-334 — data
  * first, watermark last, so a crash replays at most one chunk and the
  * replay is exact by D5).
  *
  * The per-chunk driver loop is intentional, not a failure to
  * parallelize: chunk N+1's delete depends on chunk N's watermark
  * semantics. WITHIN a chunk everything is distributed; chunks bound the
  * amount of data any single replay touches (memory/cost cap at 100 TB).
  */
object IncrementalRunner {

  /** One replication flow for one (apname, toolid): the Spark form of
    * dbtransfer/tlcd_flow. `transform` is the per-chunk cleaning step
    * (clean_endtimedata / clean_edcdata analog). Returns chunks run. */
  def replicate(spark: SparkSession,
                source: DataFrame, tsCol: String,
                sinkPath: String,
                wm: Watermarks, apname: String, toolid: String,
                now: Timestamp,
                transform: DataFrame => DataFrame = identity,
                stepSeconds: Long = 86400L, maxChunks: Int = 30): Int = {
    val start = wm.require(apname, toolid).lastEndTime
    if (!start.before(now)) return 0 // source not ahead: nothing to do
    val chunks = Intervals.chunks(start, now, stepSeconds, maxChunks)
    chunks.foreach { case (s, e) =>
      val slice = transform(
        source.filter(Intervals.OpenClosed.contains(col(tsCol), s, e)))
      SliceStore.overwriteSlice(spark, sinkPath, slice, tsCol, s, e, Intervals.OpenClosed)
      wm.advance(apname, toolid, e)
    }
    chunks.size
  }

  /** clean_endtimedata analog (reference nikon_ETL.py:170-182): project to
    * the fixed sink column order and stamp LOGIN_TIME. */
  def cleanEndtimeData(df: DataFrame, mapping: Seq[String], loginTime: Timestamp): DataFrame =
    df.select(mapping.map(col): _*).withColumn("LOGIN_TIME", lit(loginTime))
}
