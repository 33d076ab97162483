package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Temporal operators over the `events` stream that the reference's
  * relational surface lacks entirely (SURVEY §2.3 "Not present in the
  * reference: theta/range/as-of/interval joins") but any event-sourced
  * training-data or feature pipeline needs: the as-of join and exact
  * grouped quantiles.
  *
  * Scale stance:
  *  - The as-of join (q57) is implemented as UNION + per-key windowed
  *    last-match propagation — one shuffle on the join key, one
  *    within-partition time sort, zero row multiplication. The naive
  *    alternative (range θ-join then per-left-row max) materializes
  *    every (left, earlier-right) pair — quadratic per key — which is
  *    exactly the plan shape that dies at 100 TB. This is the sort-merge
  *    formulation every production as-of implementation (kdb+, Flink
  *    temporal join, QuestDB) uses.
  *  - Exact quantiles (q58) are rank selection inside a per-group sort —
  *    the honest exact path (exact order statistics are not computable
  *    without a per-group ordering pass). Its registered SCALE TWIN
  *    (q77, the q57/q62 pairing pattern) answers the same p25–p95
  *    contract through a mergeable bounded-state log-histogram sketch:
  *    one uniform partial aggregate, windows only over the bucket-count
  *    relation. Spark's stock `approx_percentile` (t-digest) fills the
  *    same role but loses the cross-engine bit-exactness this catalog's
  *    gate verifies, so the sketch is integer-deterministic instead and
  *    q77 carries a full hash oracle; TemporalSpec bounds its divergence
  *    from the exact ranks.
  *
  * Timestamps follow the catalog convention: `Tables.events` truncates
  * the parquet nanosecond longs to microseconds exactly like DuckDB 1.0
  * reads them, and all arithmetic here is integer microseconds
  * (`unix_micros` / `epoch_us`) — no FP time math anywhere.
  */
object Temporal extends QueryModule {

  // ---------------------------------------------------------------------
  // q57 — AS-OF JOIN: each purchase event matched to the same user's most
  // recent STRICTLY EARLIER click (the "state of the world as of this
  // event" join). Right side is first deduplicated per (user_id, tsu) to
  // the max event_id — as-of semantics need one row per right timestamp
  // for the match to be well-defined. The Spark plan tags both sides,
  // unions them, and propagates the latest click attributes with a
  // last(ignoreNulls) running window ordered by (tsu, side): side 0 =
  // purchase sorts BEFORE side 1 = click at equal timestamps, so an
  // equal-timestamp click is not yet visible to the purchase — strict
  // "<" semantics, no tie ambiguity. The DuckDB oracle uses the engine's
  // native ASOF LEFT JOIN — a genuinely independent algorithm — so this
  // is a two-implementation cross-check, not a mirrored plan.
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tsu"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"),
        lit(0).as("side"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("tsu"))
      .agg(max(struct(col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("tsu"),
        col("m.event_id").as("click_id"), col("m.value").as("click_value"),
        lit(1).as("side"))
    val w = Window.partitionBy("user_id").orderBy(col("tsu"), col("side"))
      .rowsBetween(Window.unboundedPreceding, -1)
    purchases.unionByName(clicks, allowMissingColumns = true)
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_value", last(col("click_value"), ignoreNulls = true).over(w))
      .withColumn("asof_click_tsu", last(when(col("side") === 1, col("tsu")), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("purchase_id"), col("user_id"), col("tsu").as("purchase_tsu"),
        col("purchase_value"),
        col("asof_click_id").as("click_id"), col("asof_click_tsu").as("click_tsu"),
        col("asof_click_value").as("click_value"),
        (col("tsu") - col("asof_click_tsu")).as("gap_us"))
      .orderBy("purchase_id")
  }

  private val q57Sql =
    """WITH l AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_tsu, value AS purchase_value
      |  FROM events WHERE event_type = 'purchase'),
      |rdedup AS (
      |  SELECT user_id, epoch_us(ts) AS tsu, MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)),
      |r AS (
      |  SELECT d.user_id, d.tsu, d.click_id, e.value AS click_value
      |  FROM rdedup d JOIN events e ON d.click_id = e.event_id)
      |SELECT l.purchase_id, l.user_id, l.purchase_tsu, l.purchase_value,
      |       r.click_id, r.tsu AS click_tsu, r.click_value,
      |       l.purchase_tsu - r.tsu AS gap_us
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.purchase_tsu > r.tsu
      |ORDER BY l.purchase_id""".stripMargin

  // ---------------------------------------------------------------------
  // q58 — exact grouped quantiles (p25/p50/p75/p95 of `value` per
  // event_type), as RANK SELECTION: the k-th smallest with
  // k(q) = ⌊(n−1)·q⌋ + 1, computed in pure integer arithmetic
  // ((n−1)·25 div 100 …) so both engines pick the same rank, and the
  // reported quantile is an ACTUAL input value (no interpolation — the
  // lower discrete quantile), so the doubles hash bit-exactly. Ties in
  // `value` are ordered by event_id: the selected rank is deterministic
  // even on duplicated values.
  private def q58(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val ranked = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    ranked
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === expr("(n - 1) * 25 div 100 + 1"), col("value"))).as("p25"),
        max(when(col("rn") === expr("(n - 1) * 50 div 100 + 1"), col("value"))).as("p50"),
        max(when(col("rn") === expr("(n - 1) * 75 div 100 + 1"), col("value"))).as("p75"),
        max(when(col("rn") === expr("(n - 1) * 95 div 100 + 1"), col("value"))).as("p95"))
      .orderBy("event_type")
  }

  private val q58Sql =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |         COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type, MAX(n) AS n,
      |       MAX(CASE WHEN rn = (n - 1) * 25 // 100 + 1 THEN value END) AS p25,
      |       MAX(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN value END) AS p50,
      |       MAX(CASE WHEN rn = (n - 1) * 75 // 100 + 1 THEN value END) AS p75,
      |       MAX(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN value END) AS p95
      |FROM ranked GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q77 — grouped quantiles, the SCALE TWIN of q58: same
  // p25/p50/p75/p95-per-event_type contract, answered by a mergeable
  // bounded-state sketch instead of a per-group global sort. Values are
  // quantized to integer micro-units (round(value·1e6), the catalog's
  // standard determinism trick), then bucketed HDR-histogram style:
  // values below 128 map to themselves (exact); larger values map to
  // (bit_length · 64 + top-7-bits) — 64 linear sub-buckets per power of
  // two, so every bucket spans ≤ 1/64 of its value. The sketch state per
  // group is ≤ ~64·64 buckets REGARDLESS of group size or value range —
  // a single uniform partial-agg shuffle at 100 TB — and the quantile is
  // read off the bucket-count cumulative sum: the reported p(q) is the
  // MIN actual value in the bucket containing rank k(q) = ⌊(n−1)q⌋+1,
  // i.e. an understate of the exact quantile by at most one bucket width
  // (≤ 1.6 % relative; TemporalSpec pins that bound against q58).
  // Windows here run ONLY over the bucket relation, never the corpus —
  // the q68 lesson. Everything is integer arithmetic until the final
  // ÷1e6, so the DuckDB oracle replays it bit-exactly (no t-digest
  // divergence; see the header note on approx_percentile).
  /** The sketch's histogram maintenance, shared verbatim with the
    * streaming twin (`Streams.quantileSketch` — one definition, the
    * q65/intake pattern): micro-unit values in, (event_type, bkt) →
    * (cnt, bmn) out. As a streaming aggregate its state is the bucket
    * domain (≤ ~2.3k rows per event_type by construction), NOT the
    * stream length — a sketch store's continuously-maintained state. */
  private[graft] def sketchHistogram(quant: DataFrame): DataFrame =
    quant // (event_type, v: long micro-units)
      .withColumn("u", col("v") + 2) // ≥ 2: bin() defined, log shape stable
      .withColumn("bkt", when(col("u") < 128, col("u"))
        .otherwise((length(bin(col("u"))) - 1) * 64 +
          expr("u div cast(pow(2.0d, length(bin(u)) - 1 - 6) as bigint)")))
      .groupBy("event_type", "bkt")
      .agg(count(lit(1)).as("cnt"), min("v").as("bmn"))

  private def q77(s: SparkSession, dir: String): DataFrame = {
    val hist = sketchHistogram(Tables.events(s, dir)
      .select(col("event_type"), round(col("value") * 1e6).cast("long").as("v")))
    val byType = Window.partitionBy("event_type")
    val cum = hist
      .withColumn("n", sum("cnt").over(byType))
      .withColumn("cum", sum("cnt").over(byType.orderBy("bkt")))
    def pick(q: Int) = (max(when(
        col("cum") - col("cnt") < expr(s"(n - 1) * $q div 100 + 1") &&
        expr(s"(n - 1) * $q div 100 + 1") <= col("cum"), col("bmn")))
      .cast("double") / 1e6).as(s"p$q")
    cum.groupBy("event_type")
      .agg(max("n").as("n"), pick(25), pick(50), pick(75), pick(95))
      .orderBy("event_type")
  }

  private val q77Sql =
    """WITH q AS (
      |  SELECT event_type, CAST(ROUND(value * 1000000.0) AS BIGINT) AS v FROM events),
      |b AS (SELECT event_type, v, v + 2 AS u FROM q),
      |h AS (
      |  SELECT event_type,
      |         CASE WHEN u < 128 THEN u
      |              ELSE (length(bin(u)) - 1) * 64 +
      |                   u // CAST(pow(2.0, length(bin(u)) - 1 - 6) AS BIGINT) END AS bkt,
      |         COUNT(*) AS cnt, MIN(v) AS bmn
      |  FROM b GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, bkt, cnt, bmn,
      |         CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bkt
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM h)
      |SELECT event_type, MAX(n) AS n,
      |       CAST(MAX(CASE WHEN cum - cnt < (n-1)*25//100 + 1 AND (n-1)*25//100 + 1 <= cum THEN bmn END) AS DOUBLE)/1000000.0 AS p25,
      |       CAST(MAX(CASE WHEN cum - cnt < (n-1)*50//100 + 1 AND (n-1)*50//100 + 1 <= cum THEN bmn END) AS DOUBLE)/1000000.0 AS p50,
      |       CAST(MAX(CASE WHEN cum - cnt < (n-1)*75//100 + 1 AND (n-1)*75//100 + 1 <= cum THEN bmn END) AS DOUBLE)/1000000.0 AS p75,
      |       CAST(MAX(CASE WHEN cum - cnt < (n-1)*95//100 + 1 AND (n-1)*95//100 + 1 <= cum THEN bmn END) AS DOUBLE)/1000000.0 AS p95
      |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q62 — the SAME as-of semantics through the NATIVE operator
  // (plans.AsofJoin: custom LogicalPlan + injected SparkStrategy +
  // sort-merge AsofJoinExec — SURVEY §7.3 preference order (c)). Three
  // independent computations of one contract now cross-check in the
  // gate: the union+window composition (q57), this native physical
  // operator, and DuckDB's built-in ASOF JOIN (the shared oracle).
  // The native plan is one exchange + sort per side feeding a streaming
  // merge that retains a single right row — no null-padded union schema,
  // no window state machine.
  private def q62(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tsu"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cuser"), col("tsu").as("click_tsu"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    graft.plans.AsofJoin(s, p, c, "user_id", "cuser", "tsu", "click_tsu", "click_id")
      .select(col("purchase_id"), col("user_id"), col("tsu").as("purchase_tsu"),
        col("purchase_value"), col("click_id"), col("click_tsu"), col("click_value"),
        (col("tsu") - col("click_tsu")).as("gap_us"))
      .orderBy("purchase_id")
  }

  // ---------------------------------------------------------------------
  // q75 — BANDED RANGE JOIN: every (purchase, click) pair of the same
  // user within ±1 hour — the proximity join behind attribution windows
  // and feature lookback. Catalyst plans a per-user inequality join as a
  // join-then-filter whose intermediate is quadratic in the key's event
  // count; the banded plan buckets time at the window width δ and
  // EQUI-joins on (user, bucket), with the purchase side expanded to its
  // 3 adjacent buckets — any pair within δ lands in adjacent buckets by
  // construction (|a−b| ≤ δ ⇒ |⌊a/δ⌋−⌊b/δ⌋| ≤ 1), a click lives in
  // exactly one bucket so no pair is produced twice, and the exact |gap|
  // filter runs on a candidate set bounded by per-bucket density, not by
  // per-user history. This is the banding every production range join
  // (Databricks range-join hints, kdb+ window joins) applies; the DuckDB
  // oracle runs the plain inequality join — independent algorithm, same
  // pairs. All time math is integer microseconds.
  private val RangeDeltaUs = 3600000000L // ±1 hour
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tsu").as("click_tsu"),
        col("event_id").as("click_id"),
        expr(s"tsu div ${RangeDeltaUs}L").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tsu").as("purchase_tsu"),
        col("event_id").as("purchase_id"))
      .select(col("user_id"), col("purchase_tsu"), col("purchase_id"),
        explode(expr(
          s"array(purchase_tsu div ${RangeDeltaUs}L - 1, purchase_tsu div ${RangeDeltaUs}L, purchase_tsu div ${RangeDeltaUs}L + 1)"))
          .as("bucket"))
    purchases.join(clicks, Seq("user_id", "bucket"))
      .filter(abs(col("purchase_tsu") - col("click_tsu")) <= RangeDeltaUs)
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (col("purchase_tsu") - col("click_tsu")).as("gap_us"))
      .orderBy("purchase_id", "click_id")
  }

  private val q75Sql =
    s"""WITH p AS (
      |  SELECT user_id, epoch_us(ts) AS purchase_tsu, event_id AS purchase_id
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, epoch_us(ts) AS click_tsu, event_id AS click_id
      |  FROM events WHERE event_type = 'click')
      |SELECT p.purchase_id, c.click_id, p.user_id,
      |       p.purchase_tsu - c.click_tsu AS gap_us
      |FROM p JOIN c ON p.user_id = c.user_id
      |  AND ABS(p.purchase_tsu - c.click_tsu) <= $RangeDeltaUs
      |ORDER BY p.purchase_id, c.click_id""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_asof_join"         -> (q57 _),
    "q58_grouped_quantiles" -> (q58 _),
    "q62_asof_native"       -> (q62 _),
    "q75_range_join"        -> (q75 _),
    "q77_quantile_sketch"   -> (q77 _),
  )

  override val oracle: Map[String, String] = Map(
    "q57_asof_join"         -> q57Sql,
    "q58_grouped_quantiles" -> q58Sql,
    "q62_asof_native"       -> q57Sql, // identical contract, third implementation
    "q75_range_join"        -> q75Sql,
    "q77_quantile_sketch"   -> q77Sql,
  )
}
