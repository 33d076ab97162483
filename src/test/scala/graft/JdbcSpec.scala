package graft

import java.sql.Timestamp
import graft.api.QueryApi
import graft.incremental.{Watermark, Watermarks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference IS a JDBC ETL (Oracle→Postgres, dbs/db.py:40-47,
  * dbs/db_pg.py:39-45); every scan here claims to be "JDBC-swappable".
  * This spec EXERCISES that claim against a real JDBC database (embedded
  * Derby — ships with Spark): write/read round-trip, interval predicates
  * pushed into the JDBC scan (no row-group stats there, so the pushed
  * predicate IS the scan bound), the incremental replication loop over a
  * JDBC source, and the query-API pipeline swapped onto JDBC relations.
  */
class JdbcSpec extends SparkTestBase {

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").toString
  private lazy val url = s"jdbc:derby:$dbDir/db;create=true"

  private def writeTable(df: DataFrame, table: String): Unit =
    df.write.format("jdbc").option("url", url).option("dbtable", table)
      .mode("overwrite").save()

  private def readTable(table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  test("JDBC round-trip preserves rows and pushes interval predicates to the scan") {
    val ev = Tables.events(spark, sfDir).select("event_id", "ts", "user_id", "value")
    writeTable(ev, "events_src")
    val src = readTable("events_src")
    assert(src.count() == ev.count())

    val lo = Timestamp.valueOf("2024-01-02 00:00:00")
    val hi = Timestamp.valueOf("2024-01-04 00:00:00")
    val filtered = src.filter(col("ts") > lo && col("ts") <= hi)
    // JDBC V1 scan: the filter must reach the source as PushedFilters —
    // against a warehouse this is what bounds the scan (there are no
    // parquet row-group stats to fall back on)
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"interval predicate not pushed into the JDBC scan:\n${plan.take(1500)}")
    // row parity with the parquet source under the same interval
    val expect = ev.filter(col("ts") > lo && col("ts") <= hi).count()
    assert(filtered.count() == expect && expect > 0)
  }

  test("incremental replicate runs unchanged over a JDBC source") {
    import graft.incremental.IncrementalRunner
    val ev = Tables.events(spark, sfDir).select("event_id", "ts", "user_id", "value")
    writeTable(ev, "events_repl")
    val src = readTable("events_repl")

    def ts(s: String) = Timestamp.valueOf(s)
    val t0 = ts("2024-01-01 00:00:00")
    val now = ts("2024-01-03 00:00:00")
    val wm = new Watermarks(spark,
      java.nio.file.Files.createTempDirectory("graft_jwm").toString + "/wm")
    wm.init(Seq(Watermark("EDC_Import", "jdbc_tool", t0, t0)))
    val sink = java.nio.file.Files.createTempDirectory("graft_jsink").toString + "/t"

    val chunks = IncrementalRunner.replicate(spark, src, "ts", sink,
      wm, "EDC_Import", "jdbc_tool", now)
    assert(chunks == 2)
    val landed = spark.read.parquet(sink)
    val expect = ev.filter(col("ts") > t0 && col("ts") <= now)
    assert(landed.count() == expect.count() && expect.count() > 0)
    assert(wm.require("EDC_Import", "jdbc_tool").lastEndTime == now)
    // D5: replay after a watermark reset lands the same rows, no dupes
    wm.advance("EDC_Import", "jdbc_tool", t0)
    IncrementalRunner.replicate(spark, src, "ts", sink, wm, "EDC_Import", "jdbc_tool", now)
    assert(spark.read.parquet(sink).count() == expect.count(), "JDBC replay duplicated rows")
  }

  test("dialect renderings: Oracle FF3/to_date forms pinned; Derby forms execute with row parity") {
    import graft.sources.{DerbyDialect, OracleDialect, PostgresDialect}
    // the Oracle renderings are the reference's literal SQL, character
    // for character (dbs/nikon.py:111-112 interval scan, :210 watermark
    // read) — the forms a live Oracle wire would receive
    assert(OracleDialect.intervalScan("TLCD01_rawdata", "tstamp",
        "2020-01-01 00:00:00.000", "2020-01-02 00:00:00.000") ==
      "SELECT * FROM TLCD01_rawdata WHERE " +
        "tstamp >= to_timestamp('2020-01-01 00:00:00.000', 'YYYY-MM-DD HH24:MI:SS.FF3') " +
        "AND tstamp < to_timestamp('2020-01-02 00:00:00.000', 'YYYY-MM-DD HH24:MI:SS.FF3')")
    assert(OracleDialect.maxTsToSecond("fdc.index_glassout", "endtime") ==
      "SELECT to_date(to_char(max(endtime),'yyyy-mm-dd hh24:mi:ss')," +
        "'yyyy-mm-dd hh24:mi:ss') AS last_end_time FROM fdc.index_glassout")
    // the Postgres rendering passes bare literals for the server-side
    // cast (R/pg_db.R:22-28)
    assert(PostgresDialect.intervalScan("t_rawdata", "tstamp",
        "2020-01-01 00:00:00", "2020-01-02 00:00:00") ==
      "SELECT * FROM t_rawdata WHERE tstamp >= '2020-01-01 00:00:00' " +
        "AND tstamp < '2020-01-02 00:00:00'")
    // Derby is the executable member: the rendered interval scan runs on
    // a real JDBC wire and must agree row-for-row with the Catalyst
    // pushdown path over the same bounds
    val ev = Tables.events(spark, sfDir).select("event_id", "ts", "user_id", "value")
    writeTable(ev, "events_d")
    val (lo, hi) = ("2024-01-02 00:00:00", "2024-01-04 00:00:00")
    // Spark's JDBC writer creates case-sensitive (quoted) identifiers on
    // Derby, so the rendered scan addresses the column quoted — exactly
    // what a deployment against a quoting warehouse passes in
    val viaDialect = spark.read.format("jdbc").option("url", url)
      .option("query", DerbyDialect.intervalScan("events_d", "\"ts\"", lo, hi)).load()
    val expect = ev.filter(col("ts") >= Timestamp.valueOf(lo) &&
      col("ts") < Timestamp.valueOf(hi))
    assert(expect.count() > 0)
    assert(viaDialect.count() == expect.count(),
      "dialect-rendered interval scan diverged from the pushdown filter")
    // and the watermark read truncates to the second ON THE WIRE
    val wmRow = spark.read.format("jdbc").option("url", url)
      .option("query", DerbyDialect.maxTsToSecond("events_d", "\"ts\"")).load()
      .collect().head
    val maxTs = ev.agg(max(col("ts"))).collect().head.getTimestamp(0)
    assert(wmRow.getTimestamp(0) ==
      Timestamp.valueOf(maxTs.toLocalDateTime.withNano(0)),
      s"wire-side second truncation diverged: ${wmRow.getTimestamp(0)} vs $maxTs")
  }

  test("write-path dialect forms: slice DELETE and watermark UPDATE render per-dialect and execute on the Derby wire") {
    import graft.sources.{DerbyDialect, OracleDialect, PostgresDialect}
    // renderings pinned: the slice delete carries the reference's
    // (lo, hi] convention (nikon.py:138-145 — note it FLIPS the scan's
    // [lo, hi) bounds, the P6 both-conventions contract) and the
    // watermark UPDATE stamps update_time from the server clock
    // (nikon.py:169-186)
    assert(OracleDialect.intervalDelete("TLCD01_rawdata", "tstamp",
        "2020-01-01 00:00:00.000", "2020-01-02 00:00:00.000") ==
      "DELETE FROM TLCD01_rawdata WHERE " +
        "tstamp > to_timestamp('2020-01-01 00:00:00.000', 'YYYY-MM-DD HH24:MI:SS.FF3') " +
        "AND tstamp <= to_timestamp('2020-01-02 00:00:00.000', 'YYYY-MM-DD HH24:MI:SS.FF3')")
    assert(PostgresDialect.intervalDelete("TLCD01_rawdata", "tstamp",
        "2020-01-01 00:00:00", "2020-01-02 00:00:00") ==
      "DELETE FROM TLCD01_rawdata WHERE tstamp > '2020-01-01 00:00:00' " +
        "AND tstamp <= '2020-01-02 00:00:00'")
    assert(PostgresDialect.watermarkUpdate("lastendtime", "EDC_Import", "nikon_1",
        "2020-01-02 00:00:00") ==
      "UPDATE lastendtime SET last_end_time = '2020-01-02 00:00:00', " +
        "update_time = now() WHERE apname = 'EDC_Import' AND toolid = 'nikon_1'")
    assert(OracleDialect.watermarkUpdate("lastendtime", "EDC_Import", "nikon_1",
        "2020-01-02 00:00:00").contains("update_time = SYSTIMESTAMP"))

    // Derby executes both statements on a real wire
    val ev = Tables.events(spark, sfDir).select("event_id", "ts", "user_id", "value")
    writeTable(ev, "events_w")
    val (lo, hi) = ("2024-01-02 00:00:00", "2024-01-04 00:00:00")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // slice delete: exactly the (lo, hi] rows disappear; replaying the
      // same delete removes nothing more (idempotent-replay precondition)
      val doomed = ev.filter(col("ts") > Timestamp.valueOf(lo) &&
        col("ts") <= Timestamp.valueOf(hi)).count()
      assert(doomed > 0)
      val deleted = st.executeUpdate(DerbyDialect.intervalDelete("events_w", "\"ts\"", lo, hi))
      assert(deleted == doomed, s"wire delete removed $deleted rows, expected $doomed")
      assert(st.executeUpdate(DerbyDialect.intervalDelete("events_w", "\"ts\"", lo, hi)) == 0)
      assert(readTable("events_w").count() == ev.count() - doomed)

      // watermark update: only the addressed (apname, toolid) row moves,
      // and update_time is stamped by the SERVER clock
      st.executeUpdate("CREATE TABLE lastendtime (apname VARCHAR(64), " +
        "toolid VARCHAR(64), last_end_time TIMESTAMP, update_time TIMESTAMP)")
      st.executeUpdate("INSERT INTO lastendtime VALUES " +
        "('EDC_Import', 'nikon_1', TIMESTAMP('2020-01-01 00:00:00'), NULL), " +
        "('EDC_Import', 'nikon_2', TIMESTAMP('2020-01-01 00:00:00'), NULL)")
      val moved = st.executeUpdate(DerbyDialect.watermarkUpdate(
        "lastendtime", "EDC_Import", "nikon_1", "2024-01-05 00:00:00"))
      assert(moved == 1, s"watermark update touched $moved rows, expected 1")
      val wm = readTable("lastendtime").collect()
        .map(r => r.getString(1) -> (r.getTimestamp(2), r.getTimestamp(3))).toMap
      assert(wm("nikon_1")._1 == Timestamp.valueOf("2024-01-05 00:00:00"))
      assert(wm("nikon_1")._2 != null, "update_time not stamped by the server clock")
      assert(wm("nikon_2")._1 == Timestamp.valueOf("2020-01-01 00:00:00") &&
        wm("nikon_2")._2 == null, "the un-addressed watermark row moved")
    } finally conn.close()
  }

  test("dialect bounds are validated: malformed or quote-bearing input is rejected, never rendered") {
    import graft.sources.{DerbyDialect, OracleDialect, PostgresDialect}
    // the reference interpolates caller strings straight into SQL
    // (nikon.py:111-112,138-145); the renderer instead rejects anything
    // off the documented yyyy-MM-dd HH:mm:ss[.SSS] shape — including the
    // classic quote-escape — on EVERY dialect and statement
    val bad = Seq("2020-01-01", "not a time", "2020-01-01 00:00:00'; DROP TABLE x--",
      "2020-13-0a 00:00:00", "2020-01-01 00:00:00.1234")
    for (d <- Seq(OracleDialect, PostgresDialect, DerbyDialect); b <- bad) {
      intercept[IllegalArgumentException](d.intervalScan("t", "ts", b, "2020-01-02 00:00:00"))
      intercept[IllegalArgumentException](d.intervalDelete("t", "ts", "2020-01-01 00:00:00", b))
      intercept[IllegalArgumentException](d.watermarkUpdate("t", "ap", "tool", b))
    }
    // quote-bearing tool/ap names are rejected too (they are fixed
    // config tokens in the reference — nikon.py:181-185)
    intercept[IllegalArgumentException](
      PostgresDialect.watermarkUpdate("t", "ap'name", "tool", "2020-01-01 00:00:00"))
    // the good shapes still render on both fraction arities
    assert(PostgresDialect.tsLiteral("2020-01-01 00:00:00.5") == "'2020-01-01 00:00:00.5'")
    assert(DerbyDialect.tsLiteral("2020-01-01 00:00:00") == "TIMESTAMP('2020-01-01 00:00:00')")
  }

  test("glassRawData pipeline over JDBC relations equals the parquet run") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    writeTable(li, "lineitem_j")
    writeTable(ord, "orders_j")
    val ids = Tables.customer(spark, sfDir).select("c_custkey").limit(5)

    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) -> math.round(r.getDouble(3) * 100)))
      .toSeq.sorted
    def normalize(df: DataFrame) = df.select(
      col("glass_id").cast("long"), col("step_id").cast("long"),
      col("site").cast("long"), col("param_value").cast("double"))

    val viaJdbc = normalize(
      QueryApi.glassRawDataFrom(readTable("lineitem_j"), readTable("orders_j"), ids))
    val viaParquet = normalize(QueryApi.glassRawData(spark, sfDir, ids, subquery = false))
    assert(viaParquet.count() > 0)
    assert(key(viaJdbc) == key(viaParquet),
      "JDBC-backed pipeline diverged from the parquet run")
  }
}
