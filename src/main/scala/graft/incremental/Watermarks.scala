package graft.incremental

import java.sql.Timestamp
import org.apache.spark.sql.{SaveMode, SparkSession}

/** The watermark control table (K6/P14, reference `lastendtime`,
  * dbs/nikon.py:19-37,169-186): one row per (apname, toolid) holding the
  * replication high-water mark. Tiny by construction (one row per
  * tool × pipeline), so a whole-table overwrite per advance is exact and
  * cheap at any scale; ordering contract per the reference
  * (nikon_ETL.py:327-334): data first, watermark last.
  */
case class Watermark(apname: String, toolid: String,
                     lastEndTime: Timestamp, updateTime: Timestamp)

class Watermarks(spark: SparkSession, path: String) {
  import spark.implicits._

  def all(): Seq[Watermark] =
    if (!SliceStore.exists(spark, path)) Seq.empty
    else spark.read.parquet(path).as[Watermark].collect().toSeq

  /** P14 check_flow: the watermark row must already exist for a flow to
    * run (reference nikon_ETL.py:148-155). */
  def get(apname: String, toolid: String): Option[Watermark] =
    all().find(w => w.apname == apname && w.toolid == toolid)

  def require(apname: String, toolid: String): Watermark =
    get(apname, toolid).getOrElse(
      throw new IllegalStateException(s"no watermark row for ($apname, $toolid) — check_flow failed"))

  /** K6 upsert: UPDATE last_end_time + update_time for the key, keeping
    * every other row (reference dbs/nikon.py:169-186 + now()). The write
    * goes through SliceStore's crash-safe swap — losing the watermark
    * table to a crash mid-swap would silently re-replicate everything
    * (or, worse, nothing). */
  def advance(apname: String, toolid: String, lastEndTime: Timestamp,
              updateTime: Timestamp = new Timestamp(System.currentTimeMillis())): Unit = {
    val rows = all().filterNot(w => w.apname == apname && w.toolid == toolid) :+
      Watermark(apname, toolid, lastEndTime, updateTime)
    SliceStore.replaceTable(spark, path, rows.toDS().repartition(1).toDF())
  }

  def init(rows: Seq[Watermark]): Unit = {
    rows.toDS().repartition(1).write.mode(SaveMode.Overwrite).parquet(path)
  }
}
