package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.QueryUtil._

/** The analytics module — SURVEY.md §2.9 (reshape + numeric analytics) and
  * §2.5 (windowed computation). Re-expresses the reference's R/dplyr stage
  * (reference R/tlcd_nikonrot.R, R/tlcd_nikonrot_mea.R, R/basic_fun.R) as
  * native DataFrame programs: `groupBy().pivot()` replaces `dcast`,
  * `unpivot` replaces `melt`, window functions replace grouped `mutate`,
  * and the per-glass rigid-body least-squares fit becomes a single
  * aggregation with closed-form normal equations (the objective is linear
  * in (sx, sy, tanθ) — see FitSpec for the iterative L-BFGS-B variant that
  * reproduces the reference's `optim` numerics).
  *
  * Scale stance: every pivot enumerates its value set explicitly (no
  * driver-side distinct pass), the fit is one shuffle-per-group aggregation
  * with tiny group payloads (≤48 sites/glass in the reference — skew-safe),
  * and nothing collects to the driver.
  */
object Analytics extends QueryModule {

  // ---------------------------------------------------------------------
  // q15 — EAV pivot long→wide (R1, reference R/tlcd_nikonrot_mea.R:105-106
  // `dcast(... ~ param_name, value.var = "param_value")`): the events table
  // is the EAV source (entity = user, attribute = event_type, value), one
  // column per attribute. Values enumerated explicitly so the plan needs no
  // pre-pass to discover pivot columns (at 100 TB a distinct scan just to
  // name columns would double the I/O).
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def q15(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(dsum(col("value")))
      .orderBy("user_id")
  }

  private val q15Sql = {
    val cols = eventTypes.map { t =>
      s"""CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "$t""""
    }.mkString(",\n       ")
    s"""SELECT user_id, $cols
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q16 — unpivot wide→long (R3, reference R/tlcd_nikonrot.R:243-248
  // `melt(..., measure.vars = rot_cols, variable.name = "item_name",
  // value.name = "rot_rs")`): lineitem measure columns → (item_name, value)
  // pairs. Spark 4's native `unpivot` (codegen'd Expand, no shuffle).
  private def q16(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 2000)
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        variableColumnName = "item_name",
        valueColumnName = "rot_rs")
      .orderBy("l_orderkey", "l_linenumber", "item_name")
  }

  private val q16Sql =
    """SELECT l_orderkey, l_linenumber, item_name, rot_rs FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS item_name, l_quantity AS rot_rs FROM lineitem WHERE l_orderkey < 2000
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem WHERE l_orderkey < 2000
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem WHERE l_orderkey < 2000
      |) ORDER BY l_orderkey, l_linenumber, item_name""".stripMargin

  // ---------------------------------------------------------------------
  // q17 — grid-completeness invariant (A5, reference R/basic_fun.R:45-50
  // `length(unique(x)) * length(unique(y)) != nrow(dat)`): per group, is
  // the (x, y) set a full cross product? One aggregation pass.
  private def q17(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("grp"), col("l_linenumber").as("x"),
              col("l_linestatus").as("y"))
      .distinct()
      .groupBy("grp")
      .agg(countDistinct(col("x")).as("nx"), countDistinct(col("y")).as("ny"),
           count(lit(1)).as("n_cells"))
      .withColumn("complete", col("nx") * col("ny") === col("n_cells"))
      .orderBy("grp")
  }

  private val q17Sql =
    """SELECT grp, COUNT(DISTINCT x) AS nx, COUNT(DISTINCT y) AS ny,
      |       COUNT(*) AS n_cells,
      |       COUNT(DISTINCT x) * COUNT(DISTINCT y) = COUNT(*) AS complete
      |FROM (SELECT DISTINCT l_returnflag AS grp, l_linenumber AS x, l_linestatus AS y FROM lineitem)
      |GROUP BY grp ORDER BY grp""".stripMargin

  // ---------------------------------------------------------------------
  // q18 — position labeling (W1 + R5, reference R/basic_fun.R:73-104):
  // z-score x → hclust/cutree into k = n/6 clusters → item_id =
  // (x_id-1)*6 + order(y) within cluster. For 1-D well-separated data the
  // clustering is exactly "sort by x and split into consecutive groups of
  // 6", which is what we do — two window functions, no iterative
  // clustering, embarrassingly parallel per glass. The n % 6 == 0 guard
  // and the site ≤ 48 filter (P9, R/tlcd_nikonrot_mea.R:102) are kept.
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val wSite = Window.partitionBy("glass").orderBy("y", "event_id")
    val ev = Tables.events(s, dir)
      .select(col("user_id").as("glass"), col("event_id"),
              col("value").as("x"), col("ts").as("y"))
      .withColumn("site_name", row_number().over(wSite))
      .filter(col("site_name") <= 48) // P9: keep first 48 sites
    val sized = ev.groupBy("glass").agg(count(lit(1)).as("n"))
      .filter(col("n") % 6 === 0) // reference aborts unless columns of 6
      .select("glass")
    val wX = Window.partitionBy("glass").orderBy("x", "event_id")
    val wY = Window.partitionBy("glass", "x_id").orderBy("y", "event_id")
    ev.join(sized, "glass")
      .withColumn("x_id", (floor((row_number().over(wX) - 1) / 6) + 1).cast("int"))
      .withColumn("item_id", ((col("x_id") - 1) * 6 + row_number().over(wY)).cast("int"))
      .select("glass", "event_id", "x_id", "item_id")
      .orderBy("glass", "item_id")
  }

  private val q18Sql =
    """WITH ev AS (
      |  SELECT * FROM (
      |    SELECT user_id AS glass, event_id, value AS x, ts AS y,
      |           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS site_name
      |    FROM events)
      |  WHERE site_name <= 48),
      |sized AS (SELECT glass FROM ev GROUP BY glass HAVING COUNT(*) % 6 = 0),
      |xid AS (
      |  SELECT ev.glass, event_id, x, y,
      |         CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY ev.glass ORDER BY x, event_id) - 1) / 6) + 1 AS INT) AS x_id
      |  FROM ev JOIN sized ON ev.glass = sized.glass)
      |SELECT glass, event_id, x_id,
      |       CAST((x_id - 1) * 6 + ROW_NUMBER() OVER (PARTITION BY glass, x_id ORDER BY y, event_id) AS INT) AS item_id
      |FROM xid ORDER BY glass, item_id""".stripMargin

  // ---------------------------------------------------------------------
  // q19 — rigid-body shift+rotate least-squares fit (R6, reference
  // R/basic_fun.R:25-33 objective, solved per glass at
  // R/tlcd_nikonrot.R:231-238 with L-BFGS-B). The objective
  //   Σ [(x + sx − dy·t)² + (y + sy + dx·t)²],  t = tan(θ·1e-6)
  // is LINEAR in (sx, sy, t) → closed-form normal equations:
  //   t  = [Σdy·x − Σdx·y − (Σx·Σdy − Σy·Σdx)/n] /
  //        [Σdx² + Σdy² − ((Σdx)² + (Σdy)²)/n]
  //   sx = (t·Σdy − Σx)/n,  sy = −(Σy + t·Σdx)/n
  // One aggregation per glass — no iteration, no driver loop; at 100 TB
  // this is a single partial-aggregated shuffle on the glass key. The
  // L-BFGS-B formulation (faithful to the reference's optim numerics) is
  // in analytics.RigidFit and cross-checked against this closed form in
  // FitSpec. Sums accumulate in DECIMAL → order-insensitive, so the fit
  // is bit-deterministic across partitionings.
  //
  // Glass = embedding label; measured diff (x, y) = embedding[1..2];
  // design coords (dx, dy) = embedding[3..4] (element_at is 1-based).
  private def fitParams(s: SparkSession, dir: String): DataFrame = {
    def d18(c: Column): Column = c.cast("decimal(28,18)")
    val pts = Tables.embeddings(s, dir)
      .select(col("label"), col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"),
        element_at(col("embedding"), 3).cast("double").as("dx"),
        element_at(col("embedding"), 4).cast("double").as("dy"))
    val agg = pts.groupBy("label").agg(
      count(lit(1)).cast("double").as("n"),
      sum(d18(col("x"))).cast("double").as("sx_"),
      sum(d18(col("y"))).cast("double").as("sy_"),
      sum(d18(col("dx"))).cast("double").as("sdx"),
      sum(d18(col("dy"))).cast("double").as("sdy"),
      sum(d18(col("dy") * col("x"))).cast("double").as("sdyx"),
      sum(d18(col("dx") * col("y"))).cast("double").as("sdxy"),
      sum(d18(col("dx") * col("dx"))).cast("double").as("sdx2"),
      sum(d18(col("dy") * col("dy"))).cast("double").as("sdy2"))
    agg
      .withColumn("t", (col("sdyx") - col("sdxy") - (col("sx_") * col("sdy") - col("sy_") * col("sdx")) / col("n"))
        / (col("sdx2") + col("sdy2") - (col("sdx") * col("sdx") + col("sdy") * col("sdy")) / col("n")))
      .withColumn("sx", (col("t") * col("sdy") - col("sx_")) / col("n"))
      .withColumn("sy", -(col("sy_") + col("t") * col("sdx")) / col("n"))
  }

  /** Shared oracle CTE computing the same normal equations in DuckDB, with
    * the identical IEEE expression tree (decimal sums → double math). */
  private val fitSqlCte =
    """pts AS (
      |  SELECT label, vec_id,
      |         CAST(embedding[1] AS DOUBLE) AS x, CAST(embedding[2] AS DOUBLE) AS y,
      |         CAST(embedding[3] AS DOUBLE) AS dx, CAST(embedding[4] AS DOUBLE) AS dy
      |  FROM embeddings),
      |agg AS (
      |  SELECT label, CAST(COUNT(*) AS DOUBLE) AS n,
      |         CAST(SUM(CAST(x AS DECIMAL(28,18))) AS DOUBLE) AS sx_,
      |         CAST(SUM(CAST(y AS DECIMAL(28,18))) AS DOUBLE) AS sy_,
      |         CAST(SUM(CAST(dx AS DECIMAL(28,18))) AS DOUBLE) AS sdx,
      |         CAST(SUM(CAST(dy AS DECIMAL(28,18))) AS DOUBLE) AS sdy,
      |         CAST(SUM(CAST(dy * x AS DECIMAL(28,18))) AS DOUBLE) AS sdyx,
      |         CAST(SUM(CAST(dx * y AS DECIMAL(28,18))) AS DOUBLE) AS sdxy,
      |         CAST(SUM(CAST(dx * dx AS DECIMAL(28,18))) AS DOUBLE) AS sdx2,
      |         CAST(SUM(CAST(dy * dy AS DECIMAL(28,18))) AS DOUBLE) AS sdy2
      |  FROM pts GROUP BY label),
      |fit AS (
      |  SELECT label, n,
      |         (sdyx - sdxy - (sx_ * sdy - sy_ * sdx) / n)
      |           / (sdx2 + sdy2 - (sdx * sdx + sdy * sdy) / n) AS t,
      |         sx_, sy_, sdx, sdy
      |  FROM agg),
      |params AS (
      |  SELECT label, n, t,
      |         (t * sdy - sx_) / n AS sx,
      |         -(sy_ + t * sdx) / n AS sy
      |  FROM fit)""".stripMargin

  private def q19(s: SparkSession, dir: String): DataFrame = {
    fitParams(s, dir)
      .select(col("label"), col("n").cast("long").as("n_sites"),
        round(col("sx"), 6).as("shift_x"),
        round(col("sy"), 6).as("shift_y"),
        round(atan(col("t")) * 1e6, 4).as("theta_urad"))
      .orderBy("label")
  }

  private val q19Sql =
    s"""WITH $fitSqlCte
      |SELECT label, CAST(n AS BIGINT) AS n_sites,
      |       ROUND(sx, 6) AS shift_x, ROUND(sy, 6) AS shift_y,
      |       ROUND(ATAN(t) * 1e6, 4) AS theta_urad
      |FROM params ORDER BY label""".stripMargin

  // ---------------------------------------------------------------------
  // q20 — transform application + residuals (R7 + R8, reference
  // R/tlcd_nikonrot.R:241-243, R/tlcd_nikonrot_mea.R:240-250): join the
  // fitted params back by glass and apply x' = x + sx − dy·t,
  // y' = y + sy + dx·t. The params side is tiny (one row per glass) →
  // broadcast join, the fact side never shuffles.
  private def q20(s: SparkSession, dir: String): DataFrame = {
    def d(c: String) = col(c).cast("double")
    val pts = Tables.embeddings(s, dir)
      .select(col("label"), col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"),
        element_at(col("embedding"), 3).cast("double").as("dx"),
        element_at(col("embedding"), 4).cast("double").as("dy"))
    val params = broadcast(fitParams(s, dir).select("label", "t", "sx", "sy"))
    pts.join(params, "label")
      .select(col("label"), col("vec_id"),
        round(d("x") + col("sx") - d("dy") * col("t"), 6).as("resid_x"),
        round(d("y") + col("sy") + d("dx") * col("t"), 6).as("resid_y"))
      .orderBy("label", "vec_id")
  }

  private val q20Sql =
    s"""WITH $fitSqlCte
      |SELECT p.label, p.vec_id,
      |       ROUND(p.x + f.sx - p.dy * f.t, 6) AS resid_x,
      |       ROUND(p.y + f.sy + p.dx * f.t, 6) AS resid_y
      |FROM pts p JOIN params f ON p.label = f.label
      |ORDER BY p.label, p.vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // q21 — summary materialized-view body (A9/K9, reference
  // dbs/nikon.py:188-197 `REFRESH MATERIALIZED VIEW ..._summary_mv`):
  // Spark has no MV, so the MV is a saved aggregation re-run after each
  // batch (the incremental module's runner calls exactly this shape).
  private def q21(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"),
           dsum(col("value")).as("total_value"),
           round(dmean(col("value")), 6).as("avg_value"))
      .orderBy("event_type", "d")
  }

  private val q21Sql =
    s"""SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n,
      |       ${sqlDsum("value")} AS total_value,
      |       ROUND(${sqlDmean("value")}, 6) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q22 — semi-structured property extraction: the events `props` column
  // is a JSON blob; extract a typed field and aggregate. Spark side uses
  // the native get_json_object (codegen'd); the oracle phrases the same
  // extraction as a regexp so it carries no DuckDB extension dependency —
  // two engines, two idioms, same relation.
  private def q22(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") > 50)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_high"), sum(col("k")).as("sum_k"))
      .orderBy("user_id")
  }

  private val q22Sql =
    """SELECT user_id, COUNT(*) AS n_high, CAST(SUM(k) AS BIGINT) AS sum_k FROM (
      |  SELECT user_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k FROM events)
      |WHERE k > 50 GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q25 — gap-based sessionization (batch twin of
  // streaming.Streams.sessionize; StreamingSpec cross-checks the two —
  // the reference's "two strategies, same answer" idea D3 applied to
  // batch vs streaming): lag + cumulative-sum session ids, 30-minute
  // gap. Gaps compare in integer MICROSECONDS (unix_micros / epoch_us) —
  // exact in both engines, no floating-point epoch.
  private def q25(s: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    Tables.events(s, dir)
      .filter(col("user_id") < 40)
      .select(col("user_id"), col("event_id"), col("value"),
              unix_micros(col("ts")).as("tsu"))
      .withColumn("prev", lag(col("tsu"), 1).over(wU))
      .withColumn("new_s",
        when(col("prev").isNull || col("tsu") - col("prev") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           dsum(col("value")).as("total_value"),
           date_format(timestamp_micros(min(col("tsu"))), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_ts"),
           date_format(timestamp_micros(max(col("tsu"))), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"))
      .orderBy("user_id", "session_id")
  }

  private val q25Sql =
    s"""WITH ev AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS tsu
      |  FROM events WHERE user_id < 40),
      |lagd AS (
      |  SELECT *, LAG(tsu, 1) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev FROM ev),
      |marked AS (
      |  SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000 THEN 1 ELSE 0 END AS new_s FROM lagd),
      |sess AS (
      |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, COUNT(*) AS n_events, ${sqlDsum("value")} AS total_value,
      |       strftime(make_timestamp(MIN(tsu)), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
      |       strftime(make_timestamp(MAX(tsu)), '%Y-%m-%d %H:%M:%S.%f') AS end_ts
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------------

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_eav_pivot"      -> (q15 _),
    "q16_unpivot_melt"   -> (q16 _),
    "q17_grid_invariant" -> (q17 _),
    "q18_position_label" -> (q18 _),
    "q19_rigid_fit"      -> (q19 _),
    "q20_fit_residuals"  -> (q20 _),
    "q21_summary_mv"     -> (q21 _),
    "q22_json_extract"   -> (q22 _),
    "q25_sessionize"     -> (q25 _),
    // R5 fidelity path: hclust(ward.D)/cutree semantics per glass. No
    // oracle SQL (iterative agglomeration isn't SQL-expressible → the
    // driver's rows-only check applies); PositionLabelSpec carries the
    // correctness contract, incl. equality with q18 on separated columns.
    "q47_position_label_ward" -> ((s, dir) => graft.analytics.Hclust1D.labeled(s, dir)),
  )

  override val oracle: Map[String, String] = Map(
    "q15_eav_pivot"      -> q15Sql,
    "q16_unpivot_melt"   -> q16Sql,
    "q17_grid_invariant" -> q17Sql,
    "q18_position_label" -> q18Sql,
    "q19_rigid_fit"      -> q19Sql,
    "q20_fit_residuals"  -> q20Sql,
    "q21_summary_mv"     -> q21Sql,
    "q22_json_extract"   -> q22Sql,
    "q25_sessionize"     -> q25Sql,
  )
}
