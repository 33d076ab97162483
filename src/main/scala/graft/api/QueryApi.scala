package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The interactive query API surface (reference eda_query.py:260-277
  * `edc_main`/`teg_main` → `Queryedc.glass_history` / `glass_data` /
  * `Queryteg.glass_raw_data`, queries in dbs/auto.py:19-200). A user of
  * the reference's Python functions calls these instead; the 200-thread
  * and 50-process scatter-gather pools (eda_query.py:24,83) disappear —
  * each call is one declarative join pipeline and Spark tasks supply the
  * parallelism.
  *
  * Mapped onto the shared testdata star schema: glass → customer key,
  * history → orders, detail → lineitem. Against a real warehouse the
  * same pipelines run over `spark.read.jdbc` sources unchanged.
  */
object QueryApi {

  /** glass_history (reference eda_query.py:164-171, dbs/auto.py:19-38):
    * per-id history rows, time-ordered — the driving keyed lookup. `ids`
    * is a one-column DataFrame (from Sources.idList or any relation);
    * the fan-out of one point query per id becomes a single broadcast
    * semi-join. */
  def glassHistory(s: SparkSession, dir: String, ids: DataFrame): DataFrame = {
    val keyed = ids.toDF("custkey")
    Tables.orders(s, dir)
      .join(broadcast(keyed), col("o_custkey") === col("custkey"), "left_semi")
      .select(col("o_custkey").as("glass_id"), col("o_orderkey").as("step_id"),
              col("o_orderdate").as("glass_start_time"), col("o_orderpriority"))
      .orderBy("glass_id", "glass_start_time", "step_id")
  }

  /** The reference's typed miss signal (dbs/auto.py:13, raised at :37
    * when a history lookup returns no rows). A distributed lookup can't
    * raise per-id mid-plan, so the primary surface is [[missingIds]];
    * this exception is the strict-caller adapter over it. */
  final case class GlassDoesNotExist(glassIds: Seq[Long])
    extends IllegalArgumentException(s"(type=${glassIds.mkString(",")})")

  /** The miss surface of [[glassHistory]] (reference GlassDoesNotExist,
    * dbs/auto.py:13,37): the requested ids with NO history row, as a
    * relation — the K8 dead-letter shape, so a caller routes misses to
    * an error sink (or checks them) instead of getting silence on a
    * typo'd id. `glassHistory(ids)`'s key set and `missingIds(ids)`
    * partition the request: every requested id appears in exactly one.
    *
    * Shape: ONE broadcast semi pass over orders (the same probe
    * glassHistory runs) reduces to the ≤|ids| distinct hit keys, and
    * the miss is a broadcast anti over the request itself — orders is
    * never shuffled and the anti join is request-sized × request-sized. */
  def missingIds(s: SparkSession, dir: String, ids: DataFrame): DataFrame = {
    val keyed = ids.toDF("custkey")
    val hit = Tables.orders(s, dir)
      .join(broadcast(keyed), col("o_custkey") === col("custkey"), "left_semi")
      .select(col("o_custkey").as("custkey")).distinct()
    keyed.join(broadcast(hit), Seq("custkey"), "left_anti")
      .select(col("custkey").as("glass_id")).distinct()
      .orderBy("glass_id")
  }

  /** [[glassHistory]] with the reference's raise-on-miss contract: any
    * requested id absent from history throws [[GlassDoesNotExist]]
    * naming ALL missing ids (the relational check is request-bounded —
    * the one collect is over [[missingIds]], never over history). */
  def glassHistoryStrict(s: SparkSession, dir: String, ids: DataFrame): DataFrame = {
    val miss = missingIds(s, dir, ids).collect().map(_.getLong(0)).toSeq
    if (miss.nonEmpty) throw GlassDoesNotExist(miss)
    glassHistory(s, dir, ids)
  }

  /** glass_data (reference eda_query.py:174-187, dbs/auto.py:41-62): the
    * per-(glass, step, start_time) detail lookup — the 50-process pool
    * becomes one equi-join from the history relation. */
  def glassData(s: SparkSession, dir: String, history: DataFrame): DataFrame = {
    Tables.lineitem(s, dir)
      .join(history.select(col("step_id"), col("glass_id"), col("glass_start_time")),
        col("l_orderkey") === col("step_id"))
      .select(col("glass_id"), col("step_id"), col("glass_start_time"),
              col("l_linenumber").as("site"), col("l_quantity").as("param_value"))
      .orderBy("glass_id", "step_id", "site")
  }

  /** glass_raw_data with the caller-selectable physical strategy flag
    * (reference `subquery=True/False`, eda_query.py:216-231, D3):
    *  - `subquery = true`  → the correlated-IN phrasing through the SQL
    *    parser (Catalyst decorrelates it);
    *  - `subquery = false` → the hand-decorrelated semi-join.
    * Both produce the same relation — the reference's own timing harness
    * cross-checked exactly this, and ApiSpec keeps doing so. */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong()

  def glassRawData(s: SparkSession, dir: String, ids: DataFrame,
                   subquery: Boolean): DataFrame = {
    val keyed = ids.toDF("custkey")
    if (subquery) {
      // per-call view names so concurrent callers can't interleave; the
      // views are dropped before returning — s.sql analyzes eagerly, so
      // the returned plan no longer needs them and leaving them would
      // leak catalog entries for the session's lifetime
      val n = viewSeq.incrementAndGet()
      Tables.lineitem(s, dir).createOrReplaceTempView(s"api_lineitem_$n")
      Tables.orders(s, dir).createOrReplaceTempView(s"api_orders_$n")
      keyed.createOrReplaceTempView(s"api_ids_$n")
      try s.sql(
        s"""SELECT o.o_custkey AS glass_id, l.l_orderkey AS step_id,
          |       l.l_linenumber AS site, l.l_quantity AS param_value
          |FROM api_lineitem_$n l JOIN api_orders_$n o ON l.l_orderkey = o.o_orderkey
          |WHERE o.o_custkey IN (SELECT custkey FROM api_ids_$n)
          |ORDER BY glass_id, step_id, site""".stripMargin)
      finally {
        s.catalog.dropTempView(s"api_lineitem_$n")
        s.catalog.dropTempView(s"api_orders_$n")
        s.catalog.dropTempView(s"api_ids_$n")
      }
    } else glassRawDataFrom(Tables.lineitem(s, dir), Tables.orders(s, dir), ids)
  }

  /** Source-agnostic form of the decorrelated pipeline: the same program
    * over ANY lineitem/orders relations — parquet in tests,
    * `spark.read.jdbc` against a warehouse (JdbcSpec proves the swap:
    * identical results, predicates pushed into the JDBC scan). This is
    * the substance behind "JDBC-swappable": the pipeline never names its
    * storage. */
  def glassRawDataFrom(lineitem: DataFrame, orders: DataFrame, ids: DataFrame): DataFrame = {
    val keyed = ids.toDF("custkey")
    lineitem
      .join(orders.join(broadcast(keyed),
          col("o_custkey") === col("custkey"), "left_semi"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("glass_id"), col("l_orderkey").as("step_id"),
              col("l_linenumber").as("site"), col("l_quantity").as("param_value"))
      .orderBy("glass_id", "step_id", "site")
  }

  /** The map-shaped result the reference's API hands back
    * ({glass_id → rows}, eda_query.py:71) — only materialize this
    * grouping at the API edge, and only when the caller genuinely wants
    * a per-key collection. */
  def grouped(df: DataFrame, key: String): Dataset[(Long, Seq[String])] = {
    import df.sparkSession.implicits._
    df.select(col(key).cast("long"), to_json(struct(df.columns.map(col): _*)))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, it.map(_._2).toSeq))
  }
}
