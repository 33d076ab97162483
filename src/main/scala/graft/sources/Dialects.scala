package graft.sources

/** Per-dialect SQL rendering for the JDBC deployment surface.
  *
  * The reference's warehouse scans are dialect-specific SQL strings: the
  * Oracle-flavored interval scan renders its bounds as
  * `to_timestamp('…', 'YYYY-MM-DD HH24:MI:SS.FF3')`
  * (/root/reference/dbs/nikon.py:111-112), its watermark read truncates
  * to the second via the `to_date(to_char(max(endtime),'yyyy-mm-dd
  * hh24:mi:ss'),'yyyy-mm-dd hh24:mi:ss')` idiom
  * (/root/reference/dbs/nikon.py:210), while the Postgres/R side passes
  * bare literals and lets the server cast
  * (/root/reference/R/pg_db.R:22-28). In the Spark deployment the same
  * need appears when an interval scan is pushed to a warehouse as a
  * `query`/`dbtable` subselect instead of a Catalyst filter (e.g. when
  * the source column needs a server-side cast Spark's pushdown cannot
  * express): the rendering below is that surface, with the Derby member
  * executable in-process (JdbcSpec) so the literal forms are pinned
  * against a real wire even without an Oracle/Postgres server.
  *
  * The write path is rendered too: the reference's idempotent-replay
  * slice DELETE (`tstamp > lo AND tstamp <= hi`,
  * /root/reference/dbs/nikon.py:138-145; the parameterized `"endtime"`
  * twin /root/reference/dbs/nikon.py:117-136 binds the same shape
  * server-side) and its watermark UPDATE
  * (/root/reference/dbs/nikon.py:169-186). In the Spark deployment
  * these are [[graft.incremental.SliceStore]]'s slice overwrite and
  * [[graft.incremental.Watermarks]]'s control-table advance; the
  * renderings here are what a JDBC-sink deployment would issue instead.
  *
  * Unlike the reference, bounds are VALIDATED before interpolation
  * (nikon.py formats caller strings straight into SQL): [[SqlDialect
  * .requireTs]] rejects anything that is not a plain
  * `yyyy-MM-dd HH:mm:ss[.SSS]` timestamp, and [[SqlDialect.strLiteral]]
  * rejects quote-bearing tool/ap names, so a stray quote can never
  * break — or inject into — a rendered statement.
  */
sealed trait SqlDialect {
  import SqlDialect.{requireTs, strLiteral}

  /** Render a `yyyy-MM-dd HH:mm:ss[.SSS]` timestamp string as a SQL
    * literal this dialect's server parses — validated FIRST, so every
    * rendering path (scan, delete, update) rejects malformed bounds. */
  final def tsLiteral(ts: String): String = renderTs(requireTs(ts))

  /** Dialect-specific literal shape for an ALREADY-validated bound. */
  protected def renderTs(ts: String): String

  /** This dialect's server-clock expression (the `now()` of
    * nikon.py:174). */
  def nowExpr: String

  /** The reference's interval scan (half-open `[lo, hi)`, BOTH
    * conventions carried by the caller's bounds — nikon.py:111-112 /
    * pg_db.R:22-28). */
  final def intervalScan(table: String, tsCol: String, lo: String, hi: String): String =
    s"SELECT * FROM $table WHERE $tsCol >= ${tsLiteral(lo)} " +
      s"AND $tsCol < ${tsLiteral(hi)}"

  /** The reference's slice delete — the `(lo, hi]` DELETE issued before
    * an idempotent replay re-lands the slice (nikon.py:138-145; note the
    * read path is `[lo, hi)` while the delete is `(lo, hi]` — the P6
    * both-conventions contract, carried verbatim). The Spark-native twin
    * is `SliceStore.overwriteSlice`. */
  final def intervalDelete(table: String, tsCol: String, lo: String, hi: String): String =
    s"DELETE FROM $table WHERE $tsCol > ${tsLiteral(lo)} " +
      s"AND $tsCol <= ${tsLiteral(hi)}"

  /** The reference's watermark UPDATE (nikon.py:169-186): advance
    * `last_end_time` and stamp `update_time` from the SERVER clock. The
    * Spark-native twin is `Watermarks.advance`. */
  final def watermarkUpdate(table: String, apname: String, toolid: String,
                            lastEnd: String): String =
    s"UPDATE $table SET last_end_time = ${tsLiteral(lastEnd)}, " +
      s"update_time = $nowExpr WHERE apname = ${strLiteral(apname)} " +
      s"AND toolid = ${strLiteral(toolid)}"

  /** The reference's watermark read: max event time truncated to the
    * second (nikon.py:210's to_date(to_char(…)) round-trip). */
  def maxTsToSecond(table: String, tsCol: String): String
}

object SqlDialect {
  private val TsShape =
    java.util.regex.Pattern.compile("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d{1,3})?""")

  /** Validate the documented `yyyy-MM-dd HH:mm:ss[.SSS]` bound shape
    * before it is interpolated into SQL — the reference's own
    * format-string interpolation (nikon.py:111-112,138-145) accepts any
    * string; here a malformed (or quote-bearing) bound is rejected
    * instead of rendered. */
  private[sources] def requireTs(ts: String): String = {
    require(TsShape.matcher(ts).matches(),
      s"malformed timestamp bound '$ts' — expected yyyy-MM-dd HH:mm:ss[.SSS]")
    ts
  }

  /** Render a tool/ap name as a quoted SQL string literal, rejecting
    * quote-bearing input rather than escaping it (the reference's names
    * are fixed config tokens — nikon.py:181-185). */
  private[sources] def strLiteral(s: String): String = {
    require(!s.contains("'") && !s.contains("\\"),
      s"string literal '$s' carries quoting characters — rejected")
    s"'$s'"
  }
}

/** Oracle rendering — fractional-second (FF3) to_timestamp bounds and
  * the to_date/to_char second-truncation round-trip, exactly the
  * literal forms the reference issues (nikon.py:111-112, 210). */
case object OracleDialect extends SqlDialect {
  protected def renderTs(ts: String): String =
    s"to_timestamp('$ts', 'YYYY-MM-DD HH24:MI:SS.FF3')"
  def nowExpr: String = "SYSTIMESTAMP"
  def maxTsToSecond(table: String, tsCol: String): String =
    s"SELECT to_date(to_char(max($tsCol),'yyyy-mm-dd hh24:mi:ss')," +
      s"'yyyy-mm-dd hh24:mi:ss') AS last_end_time FROM $table"
}

/** Postgres rendering — bare literals, server-side cast (pg_db.R:22-28);
  * the second-truncation uses date_trunc, the idiomatic PG form of
  * nikon.py:210's Oracle round-trip; `now()` is the reference's own
  * update_time stamp (nikon.py:174). */
case object PostgresDialect extends SqlDialect {
  protected def renderTs(ts: String): String = s"'$ts'"
  def nowExpr: String = "now()"
  def maxTsToSecond(table: String, tsCol: String): String =
    s"SELECT date_trunc('second', max($tsCol)) AS last_end_time FROM $table"
}

/** Derby rendering — ANSI TIMESTAMP() constructor (Derby has no
  * implicit text→timestamp cast and no to_timestamp/date_trunc). The
  * executable member of the family: JdbcSpec runs these against an
  * embedded Derby wire to pin row parity with the Catalyst-pushdown
  * path — scan, delete, and watermark update alike. */
case object DerbyDialect extends SqlDialect {
  protected def renderTs(ts: String): String = s"TIMESTAMP('$ts')"
  def nowExpr: String = "CURRENT_TIMESTAMP"
  def maxTsToSecond(table: String, tsCol: String): String =
    // Derby lacks date_trunc/to_char; the varchar round-trip on the
    // second-resolution prefix is the same truncation contract
    s"SELECT TIMESTAMP(SUBSTR(CAST(max($tsCol) AS VARCHAR(29)), 1, 19)) " +
      s"AS last_end_time FROM $table"
}
