package graft.incremental

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured result sinks of the analytics stage. */
object Sinks {

  /** K7 — header/detail insert with a shared surrogate key (reference
    * R/pg_db.R:62-111: `WITH ins AS (INSERT ... RETURNING rot_id), ins2 AS
    * (INSERT ... SELECT rot_id FROM ins)`): a serial header id propagated
    * to detail rows.
    *
    * The DB's serial is replaced with a DETERMINISTIC surrogate — a dense
    * row_number over the natural header key — rather than
    * `monotonically_increasing_id` (partition-dependent, non-replayable:
    * a replay under D5 must regenerate identical keys or detail rows
    * orphan). Returns (header with rot_id, detail with rot_id).
    *
    * Scale note: the window is over the header relation only (one row per
    * glass — small); detail rows get the key via a broadcast-joinable
    * equi-join on the natural key, no detail-side shuffle.
    */
  def headerDetail(header: DataFrame, detail: DataFrame,
                   naturalKey: Seq[String]): (DataFrame, DataFrame) = {
    val w = Window.orderBy(naturalKey.map(col): _*)
    val h = header.withColumn("rot_id", row_number().over(w).cast("long"))
    val d = detail.join(broadcast(h.select((naturalKey :+ "rot_id").map(col): _*)), naturalKey)
    (h, d)
  }

  /** K8 — dead-letter sink (reference R/pg_db.R:114-139 + flag taxonomy at
    * R/tlcd_nikonrot.R:142-196,263-272): rows that fail a pipeline stage
    * are appended to an errors table with a reason flag instead of
    * aborting the batch. Flags mirror the reference:
    *   1 ok, −1 missing data, −2 no design values, −3 bad grid, −4 fit error. */
  val FlagOk = 1
  val FlagMissing = -1
  val FlagNoDesign = -2
  val FlagBadGrid = -3
  val FlagFitError = -4

  def deadLetter(rows: DataFrame, flag: Int, description: String): DataFrame =
    rows.withColumn("flag", lit(flag)).withColumn("description", lit(description))

  def appendErrors(errors: DataFrame, path: String): Unit =
    errors.write.mode(SaveMode.Append).parquet(path)

  /** P12 — missing-value split (reference R/tlcd_nikonrot.R:168-196 +
    * R/basic_fun.R:76-80): partition a frame into (clean, flagged-missing)
    * on NULLs in the measurement columns; the flagged half routes to K8. */
  def splitMissing(df: DataFrame, measureCols: Seq[String]): (DataFrame, DataFrame) = {
    val anyNull = measureCols.map(col(_).isNull).reduce(_ || _)
    (df.filter(!anyNull), deadLetter(df.filter(anyNull), FlagMissing, "missing measurement"))
  }
}
