package graft.incremental

import java.sql.Timestamp
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Idempotent slice-overwrite writer (K4/K5 + D5, reference
  * dbs/nikon.py:117-145 DELETE-interval + nikon_ETL.py:349-370 re-insert):
  * replaying a time interval must have exactly-once effect on the overlap.
  *
  * The reference deletes the interval in the sink, then re-inserts the
  * source rows for the same interval. The Spark analog is an overwrite of
  * the time slice: keep = sink ∖ interval, write keep ∪ new.
  *
  * Scale note (100 TB): this local implementation is read-modify-write of
  * the whole table, which is correct but O(table) — fine for the control
  * tables it serves here. On a real deployment the fact tables are
  * date-partitioned and the same contract is `INSERT OVERWRITE` of the
  * affected partitions only (dynamic partition overwrite /
  * `replaceWhere`), i.e. O(slice); the API below is the stable seam where
  * that swap happens, callers don't change.
  */
object SliceStore {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Overwrite rows of `path` inside the interval with `slice`, preserving
    * all rows outside it. Reads the survivors eagerly (checkpoint via
    * local collect-free materialization to a temp dir) so the subsequent
    * overwrite of the same path is safe. */
  def overwriteSlice(spark: SparkSession, path: String, slice: DataFrame,
                     tsCol: String, s: Timestamp, e: Timestamp,
                     conv: Intervals.Convention = Intervals.OpenClosed): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".staging")
    fs.delete(tmp, true)
    if (!fs.exists(target)) {
      slice.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val keep = read(spark, path).filter(!conv.contains(col(tsCol), s, e))
    // Align source columns to the sink schema (T1) before the union.
    val aligned = SchemaReconcile.reconcile(slice, keep.columns.toSeq)
    keep.unionByName(aligned).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(target, true)
    require(fs.rename(tmp, target), s"rename $tmp -> $target failed")
  }
}
