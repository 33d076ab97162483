package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's entries. Each module pairs a Spark
  * DataFrame program with the equivalent ANSI SQL for the driver's DuckDB
  * oracle; column names/order are kept identical on both sides.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    _root_.graft.queries.Relational,
    _root_.graft.queries.Analytics,
    _root_.graft.queries.IncrementalQueries,
    _root_.graft.queries.Dedup,
    _root_.graft.queries.IncrementalDedup,
    _root_.graft.queries.IncrementalContain,
    _root_.graft.queries.IncrementalGraphAnn,
    _root_.graft.queries.IncrementalMediaDedup,
    _root_.graft.queries.IncrementalPrepare,
    _root_.graft.queries.IncrementalPack,
    _root_.graft.queries.LexIndex,
    _root_.graft.queries.Takedown,
    _root_.graft.queries.Similarity,
    _root_.graft.queries.TextPipeline,
    _root_.graft.queries.Curation,
    _root_.graft.queries.Temporal,
    _root_.graft.queries.Corpus,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
