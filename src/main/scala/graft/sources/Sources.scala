package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Auxiliary sources beyond the parquet tables (SURVEY §2.1). */
object Sources {

  /** S6 — id-list source (reference eda_query.py:236-238,262-264: read
    * `sample.csv` of glass ids, strip whitespace): a one-column text/CSV
    * file of keys, trimmed, nulls/empties dropped, deduplicated. The
    * result is the driving relation of the lookup-join pipeline (J7) —
    * never collected to the driver. */
  def idList(spark: SparkSession, path: String, colName: String = "id"): DataFrame =
    spark.read.textFile(path)
      .select(trim(col("value")).as(colName))
      .filter(col(colName) =!= "")
      .distinct()

  /** F5 — select columns whose NAME matches a regex (reference
    * R/tlcd_nikonrot.R:90-93 `grep("^plfn_al\\d[x]\\d_x", rot_cols)`):
    * driver-side schema work, not a row-level operation — the per-tool
    * measurement column sets are discovered at runtime (P3). */
  def columnsMatching(df: DataFrame, regex: String): Seq[String] =
    df.columns.filter(_.matches(regex)).toSeq

  def selectMatching(df: DataFrame, fixed: Seq[String], regex: String): DataFrame =
    df.select((fixed ++ columnsMatching(df, regex)).map(col): _*)
}
