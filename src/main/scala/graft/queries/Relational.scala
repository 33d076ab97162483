package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.QueryUtil._

/** The relational query surface of the engine — SURVEY.md §2.2–§2.8.
  *
  * Re-expresses the reference's hand-composed SQL + thread/process-pool
  * scatter-gather (reference eda_query.py:50-155, dbs/auto.py:19-200,
  * dbs/nikon.py:75-283) as declarative DataFrame programs: Catalyst does
  * pushdown/pruning/join-selection, Spark tasks replace the 200-thread and
  * 50-process pools (SURVEY §2.10 D1–D3).
  *
  * Scale stance (100 TB): every query filters/projects before joining so
  * parquet scans prune; dimension lookups are `broadcast()` (no shuffle of
  * the fact table for them); fact-fact joins shuffle once on their keys and
  * AQE handles skew; nothing collects to the driver.
  */
object Relational extends QueryModule {

  /** Flagship: star join with broadcast dimensions (driver smoke test). */
  def flagship(s: SparkSession, dir: String): DataFrame = q05(s, dir)

  // ---------------------------------------------------------------------
  // q01 — the candidate-tool query (reference dbs/nikon.py:75-105).
  // DISTINCT + half-open time range (P6 `(s,e]`) + LIKE `_` wildcard (P7)
  // + plain semi-join (J4) + semi-join on a computed key (J5, mirrors
  // `upper(substr(relname,1,8))` at dbs/nikon.py:93) + F1/F2 + A3.
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import graft.incremental.Intervals
    // interval-pruned scan: raw-ns predicate reaches the parquet scan
    val ev = Tables.eventsInterval(s, dir,
      java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-25 00:00:00"), Intervals.OpenClosed)
    val cust = Tables.customer(s, dir)
    // J4: whitelist semi-join (reference: operationid IN (SELECT proc_operation ...))
    val whitelist = cust.filter(col("c_acctbal") > 0).select(col("c_custkey").as("uid"))
    // J5: semi-join on a computed key, like upper(substr(relname,1,8))
    val computed = cust
      .filter(col("c_name").like("Customer#%") && col("c_mktsegment") === "BUILDING")
      .select((substring(upper(col("c_name")), 10, 9).cast("long") % 150).as("uid2"))
    ev.filter(col("event_type").like("_____"))
      .join(whitelist, col("user_id") === col("uid"), "left_semi")
      .join(computed, col("user_id") === col("uid2"), "left_semi")
      .select("user_id").distinct()
      .orderBy("user_id")
  }

  private val q01Sql =
    """SELECT DISTINCT user_id FROM events
      |WHERE ts > TIMESTAMP '2024-01-05 00:00:00' AND ts <= TIMESTAMP '2024-01-25 00:00:00'
      |  AND event_type LIKE '_____'
      |  AND user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
      |  AND user_id IN (SELECT CAST(substring(upper(c_name), 10, 9) AS BIGINT) % 150
      |                  FROM customer WHERE c_name LIKE 'Customer#%' AND c_mktsegment = 'BUILDING')
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q02 — the 3-key measurement join (reference dbs/nikon.py:256-283,
  // R/ora_db.R:18-39): detail ⋈ summary on (glass_id, step_id,
  // glass_start_time) + time range (P6 `[s,e)`) + IN list (P8).
  // Here: lineitem detail ⋈ per-(orderkey,partkey,suppkey) summary.
  // Scale: both sides shuffle once on the same 3-part key; the aggregate
  // is partial (map-side combine) before the shuffle.
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1999-01-01 00:00:00")))
    val keys = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val summary = li.groupBy(keys.map(col): _*)
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
    li.filter(col("l_returnflag").isin("A", "R"))
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
      .join(summary, keys)
      .orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
  }

  private val q02Sql =
    s"""WITH summary AS (
      |  SELECT l_orderkey, l_partkey, l_suppkey,
      |         ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_lines
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |  GROUP BY 1, 2, 3)
      |SELECT t.l_orderkey, t.l_partkey, t.l_suppkey, t.l_linenumber, t.l_quantity,
      |       s.sum_qty, s.n_lines
      |FROM lineitem t
      |JOIN summary s ON t.l_orderkey = s.l_orderkey AND t.l_partkey = s.l_partkey AND t.l_suppkey = s.l_suppkey
      |WHERE t.l_returnflag IN ('A', 'R')
      |  AND t.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND t.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |ORDER BY t.l_orderkey, t.l_partkey, t.l_suppkey, t.l_linenumber""".stripMargin

  // ---------------------------------------------------------------------
  // q03 — the correlated-IN query (reference dbs/auto.py:160-185), which
  // the reference manually parameterizes per outer row (J6). Decorrelated
  // here into a 4-key left-semi join — Catalyst's RewritePredicateSubquery
  // produces the same plan from the SQL phrasing (cross-checked by the D3
  // two-plans test in RelationalSpec).
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val inner = li.filter(col("l_quantity") >= 45)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linestatus")
    li.join(inner, Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linestatus"), "left_semi")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
  }

  /** Alternate physical phrasing of q03 (reference's `subquery=True` path,
    * eda_query.py:216-231): correlated IN through the SQL parser. Used by
    * the cross-check test, not the driver contract. */
  def q03Correlated(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q03")
    s.sql(
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem_q03 t
        |WHERE t.l_linestatus IN (
        |  SELECT i.l_linestatus FROM lineitem_q03 i
        |  WHERE i.l_orderkey = t.l_orderkey AND i.l_partkey = t.l_partkey
        |    AND i.l_suppkey = t.l_suppkey AND i.l_quantity >= 45)
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin)
  }

  private val q03Sql =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem t
      |WHERE t.l_linestatus IN (
      |  SELECT i.l_linestatus FROM lineitem i
      |  WHERE i.l_orderkey = t.l_orderkey AND i.l_partkey = t.l_partkey
      |    AND i.l_suppkey = t.l_suppkey AND i.l_quantity >= 45)
      |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------------
  // q04 — the scatter-gather query API as one join pipeline (J7/J8):
  // replaces the reference's 200-thread per-glass history fan-out +
  // 50-process detail fan-out (eda_query.py:50-155,164-231; dbs/auto.py)
  // with ids ⋈ orders ⋈ lineitem. The composite-string-key dict-zip join
  // (eda_query.py:201-214) becomes a plain equi-join.
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select((col("user_id") * 10).as("custkey")).distinct()
    val hist = Tables.orders(s, dir)
      .join(ids, col("o_custkey") === col("custkey"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    Tables.lineitem(s, dir)
      .join(hist, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
           count(col("l_orderkey")).as("n_lines"),
           dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("custkey")
  }

  private val q04Sql =
    s"""WITH ids AS (SELECT DISTINCT user_id * 10 AS custkey FROM events WHERE event_type = 'purchase'),
      |hist AS (SELECT o.o_orderkey, o.o_custkey, o.o_orderdate
      |         FROM orders o JOIN ids ON o.o_custkey = ids.custkey)
      |SELECT h.o_custkey AS custkey,
      |       COUNT(DISTINCT h.o_orderkey) AS n_orders,
      |       COUNT(l.l_orderkey) AS n_lines,
      |       ${sqlDsum("l.l_extendedprice")} AS revenue
      |FROM hist h JOIN lineitem l ON l.l_orderkey = h.o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q05 — dimension-lookup join with broadcast (J2, reference
  // R/pg_db.R:142-163 design-value lookup): star join, all dimensions
  // broadcast so the fact table never shuffles for them.
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")))
    val pt = broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
      .select("p_partkey"))
    val sup = broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"))
    val nat = broadcast(Tables.nation(s, dir).select("n_nationkey", "n_regionkey", "n_name"))
    val reg = broadcast(Tables.region(s, dir).select("r_regionkey", "r_name"))
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_lines"),
           dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy("region", "nation")
  }

  private val q05Sql =
    s"""SELECT r.r_name AS region, n.n_name AS nation, COUNT(*) AS n_lines,
      |       ${sqlDsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE p.p_type = 'ECONOMY' AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q06 — full outer join + residual diff (J3/R8/W2, reference
  // R/tlcd_nikonrot_mea.R:240-250): per-day purchase vs click value,
  // full-outer by day, diff where both sides present (nulls propagate).
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def daily(t: String, alias: String) = ev.filter(col("event_type") === t)
      .groupBy(to_date(col("ts")).as(s"d_$alias"))
      .agg(dsum(col("value")).as(s"${alias}_value"))
    daily("purchase", "purchase")
      .join(daily("click", "click"), col("d_purchase") === col("d_click"), "full_outer")
      .select(coalesce(col("d_purchase"), col("d_click")).as("d"),
              col("purchase_value"), col("click_value"),
              round(col("purchase_value") - col("click_value"), 2).as("diff_value"))
      .orderBy("d")
  }

  private val q06Sql =
    s"""WITH p AS (SELECT CAST(ts AS DATE) AS d, ${sqlDsum("value")} AS purchase_value
      |           FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |c AS (SELECT CAST(ts AS DATE) AS d, ${sqlDsum("value")} AS click_value
      |      FROM events WHERE event_type = 'click' GROUP BY 1)
      |SELECT COALESCE(p.d, c.d) AS d, p.purchase_value, c.click_value,
      |       ROUND(p.purchase_value - c.click_value, 2) AS diff_value
      |FROM p FULL OUTER JOIN c ON p.d = c.d ORDER BY d""".stripMargin

  // ---------------------------------------------------------------------
  // q07 — coordinate-grid reconstruction (J9/R4/F13, reference
  // R/basic_fun.R:45-60): distinct x ⨯ distinct y, sorted, item_id = 1..n.
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val xs = li.select(col("l_linenumber").as("x")).distinct()
    val ys = li.select(col("l_returnflag").as("y")).distinct()
    // item_id without any global window (an unpartitioned row_number
    // serializes the grid onto one task): rank each axis by a count-based
    // self-join over the DISTINCT axis values — tiny relations, broadcast
    // by Catalyst — then item_id = (rank_x − 1)·|y| + rank_y. Equivalent
    // to ROW_NUMBER() OVER (ORDER BY x, y) on the full grid, but every
    // step is a broadcast join: nothing funnels to a single partition.
    val rankX = xs.as("a")
      .join(xs.as("b"), col("b.x") < col("a.x"), "left")
      .groupBy(col("a.x").as("x"))
      .agg((count(col("b.x")) + 1).cast("int").as("rank_x"))
    val rankY = ys.as("a")
      .join(ys.as("b"), col("b.y") < col("a.y"), "left")
      .groupBy(col("a.y").as("y"))
      .agg((count(col("b.y")) + 1).cast("int").as("rank_y"))
    val nY = ys.agg(count(lit(1)).cast("int").as("n_y"))
    rankX.crossJoin(rankY).crossJoin(nY)
      .withColumn("item_id", (col("rank_x") - 1) * col("n_y") + col("rank_y"))
      .select("x", "y", "item_id")
      .orderBy("item_id")
  }

  private val q07Sql =
    """WITH xs AS (SELECT DISTINCT l_linenumber AS x FROM lineitem),
      |ys AS (SELECT DISTINCT l_returnflag AS y FROM lineitem)
      |SELECT x, y, CAST(ROW_NUMBER() OVER (ORDER BY x, y) AS INT) AS item_id
      |FROM xs CROSS JOIN ys ORDER BY item_id""".stripMargin

  // ---------------------------------------------------------------------
  // q08 — watermark high-water-mark read (A1/F6/F7, reference
  // dbs/nikon.py:204-217: to_date(to_char(max(endtime), ...))): max event
  // time truncated to seconds, per event_type, emitted as a string.
  private def q08(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_end_time"),
           count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  private val q08Sql =
    """SELECT event_type, STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_end_time, COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q09 — existence/count probes as one relation (S8/A2/T3, reference
  // dbs/nikon.py:39-55 pg_class probe): LIKE `_` patterns counted per
  // probe, unioned (unionByName replaces list concatenation T3).
  private def q09(s: SparkSession, dir: String): DataFrame = {
    def probe(df: DataFrame, name: String, cond: org.apache.spark.sql.Column) =
      df.filter(cond).agg(count(lit(1)).as("n")).select(lit(name).as("probe"), col("n"))
    val ev = probe(Tables.events(s, dir), "events_click", col("event_type").like("cl___"))
    val or = probe(Tables.orders(s, dir), "orders_urgent", col("o_orderpriority").like("1-______"))
    val pa = probe(Tables.part(s, dir), "part_brand", col("p_brand").like("Brand#_"))
    ev.unionByName(or).unionByName(pa).orderBy("probe")
  }

  private val q09Sql =
    """SELECT * FROM (
      |  SELECT 'events_click' AS probe, COUNT(*) AS n FROM events WHERE event_type LIKE 'cl___'
      |  UNION ALL
      |  SELECT 'orders_urgent', COUNT(*) FROM orders WHERE o_orderpriority LIKE '1-______'
      |  UNION ALL
      |  SELECT 'part_brand', COUNT(*) FROM part WHERE p_brand LIKE 'Brand#_'
      |) ORDER BY probe""".stripMargin

  // ---------------------------------------------------------------------
  // q10 — distinct projection / dedup-on-subset / case-fold distinct
  // (A3/A4/T4, reference dbs/nikon.py:81-105, nikon_ETL.py:373-374).
  private def q10(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .filter(col("value") > 100)
      .select(upper(col("event_type")).as("event_type_uc"),
              (col("user_id") % 10).as("user_bucket"))
      .distinct()
      .orderBy("event_type_uc", "user_bucket")
  }

  private val q10Sql =
    """SELECT DISTINCT upper(event_type) AS event_type_uc, user_id % 10 AS user_bucket
      |FROM events WHERE value > 100 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q11 — z-score (A7/W2, reference R/basic_fun.R:83 `scale(x)`): per-user
  // standardized purchase values. Moments are decimal-exact; the final
  // expression tree is fixed IEEE arithmetic → deterministic bits; rounded
  // to 4 dp anyway.
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type") === "purchase" && col("user_id") < 30)
    val stats = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
           dsum(col("value")).as("s1"),
           dsum(col("value") * col("value"), 4).as("s2"))
      .filter(col("n") >= 2)
    ev.join(stats, "user_id")
      .select(col("user_id"), col("event_id"),
        round((col("value") - col("s1") / col("n")) /
              sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 4).as("z"))
      .orderBy("user_id", "event_id")
  }

  private val q11Sql =
    s"""WITH stats AS (
      |  SELECT user_id, COUNT(*) AS n, ${sqlDsum("value")} AS s1, ${sqlDsum("value * value", 4)} AS s2
      |  FROM events WHERE event_type = 'purchase' AND user_id < 30
      |  GROUP BY 1 HAVING COUNT(*) >= 2)
      |SELECT e.user_id, e.event_id,
      |       ROUND((e.value - s.s1 / s.n) / SQRT((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 4) AS z
      |FROM events e JOIN stats s ON e.user_id = s.user_id
      |WHERE e.event_type = 'purchase' AND e.user_id < 30
      |ORDER BY e.user_id, e.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q12 — rank-within-group (W1, reference R/basic_fun.R:93-101
  // `order(y)` within x-cluster): row_number per user by time.
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, dir).filter(col("user_id") < 20)
      .withColumn("seq",
        row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id")))
      .select("user_id", "event_id", "seq")
      .orderBy("user_id", "seq")
  }

  private val q12Sql =
    """SELECT user_id, event_id,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq
      |FROM events WHERE user_id < 20 ORDER BY user_id, seq""".stripMargin

  // ---------------------------------------------------------------------
  // q13 — top-k by time (W3/O4, reference nikon_ETL.py:268-276 manual
  // check `ORDER BY endtime DESC LIMIT 10`).
  private def q13(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .orderBy(col("ts").desc, col("event_id"))
      .limit(10)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
              date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy(col("event_id"))
  }

  private val q13Sql =
    """SELECT event_id, user_id, event_type, value, STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM (SELECT * FROM events ORDER BY ts DESC, event_id LIMIT 10)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q14 — sort by computed substring key + limit (O2/O3/O4, reference
  // R/pg_db.R:45 `order(substring(x,10,10), substring(x,8,8))`).
  private def q14(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 1000)
      .select("o_orderkey", "o_orderpriority")
      .orderBy(substring(col("o_orderpriority"), 1, 1).desc, col("o_orderkey"))
      .limit(200)
  }

  private val q14Sql =
    """SELECT o_orderkey, o_orderpriority FROM orders
      |WHERE o_orderkey < 1000
      |ORDER BY substring(o_orderpriority, 1, 1) DESC, o_orderkey LIMIT 200""".stripMargin

  // ---------------------------------------------------------------------
  // q26 — anti set-membership (P10/T2, reference R/tlcd_nikonrot.R:162
  // `filter(!(product %in% prod_no_dv))` and the row set-difference at
  // :191): customers holding no open orders, as a left-anti join — the
  // scalable form of NOT IN (one shuffle, no driver-side set). The
  // equivalent `except`-based phrasing is cross-checked in
  // RelationalSpec (two plans, same answer).
  private def q26(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select("c_custkey", "c_mktsegment", "c_acctbal")
    val open = Tables.orders(s, dir).filter(col("o_orderstatus") === "O").select("o_custkey")
    cust.join(open, col("c_custkey") === col("o_custkey"), "left_anti")
      .filter(col("c_acctbal") > 1000)
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** `except`-based phrasing of q26's key set (T2), for the cross-check. */
  def q26Except(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_acctbal") > 1000)
    val keys = cust.select("c_custkey")
      .except(Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey")))
    keys.join(cust.select("c_custkey", "c_mktsegment"), "c_custkey")
      .orderBy("c_custkey")
  }

  private val q26Sql =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE c_acctbal > 1000
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_candidate_scan"  -> (q01 _),
    "q02_threekey_join"   -> (q02 _),
    "q03_correlated_in"   -> (q03 _),
    "q04_lookup_pipeline" -> (q04 _),
    "q05_star_broadcast"  -> (q05 _),
    "q06_full_outer_diff" -> (q06 _),
    "q07_grid"            -> (q07 _),
    "q08_watermark_max"   -> (q08 _),
    "q09_exists_probes"   -> (q09 _),
    "q10_distinct_fold"   -> (q10 _),
    "q11_zscore"          -> (q11 _),
    "q12_rank_in_group"   -> (q12 _),
    "q13_topk_time"       -> (q13 _),
    "q14_substr_sort"     -> (q14 _),
    "q26_anti_join"       -> (q26 _),
  )

  override val oracle: Map[String, String] = Map(
    "q01_candidate_scan"  -> q01Sql,
    "q02_threekey_join"   -> q02Sql,
    "q03_correlated_in"   -> q03Sql,
    "q04_lookup_pipeline" -> q04Sql,
    "q05_star_broadcast"  -> q05Sql,
    "q06_full_outer_diff" -> q06Sql,
    "q07_grid"            -> q07Sql,
    "q08_watermark_max"   -> q08Sql,
    "q09_exists_probes"   -> q09Sql,
    "q10_distinct_fold"   -> q10Sql,
    "q11_zscore"          -> q11Sql,
    "q12_rank_in_group"   -> q12Sql,
    "q13_topk_time"       -> q13Sql,
    "q14_substr_sort"     -> q14Sql,
    "q26_anti_join"       -> q26Sql,
  )
}
