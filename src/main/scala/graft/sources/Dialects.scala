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
  */
sealed trait SqlDialect {
  /** Render a `yyyy-MM-dd HH:mm:ss[.SSS]` timestamp string as a SQL
    * literal this dialect's server parses. */
  def tsLiteral(ts: String): String

  /** The reference's interval scan (half-open, BOTH conventions carried
    * by the caller's bounds — nikon.py:111-112 / pg_db.R:22-28). */
  def intervalScan(table: String, tsCol: String, lo: String, hi: String): String =
    s"SELECT * FROM $table WHERE $tsCol >= ${tsLiteral(lo)} AND $tsCol < ${tsLiteral(hi)}"

  /** The reference's watermark read: max event time truncated to the
    * second (nikon.py:210's to_date(to_char(…)) round-trip). */
  def maxTsToSecond(table: String, tsCol: String): String
}

/** Oracle rendering — fractional-second (FF3) to_timestamp bounds and
  * the to_date/to_char second-truncation round-trip, exactly the
  * literal forms the reference issues (nikon.py:111-112, 210). */
case object OracleDialect extends SqlDialect {
  def tsLiteral(ts: String): String =
    s"to_timestamp('$ts', 'YYYY-MM-DD HH24:MI:SS.FF3')"
  def maxTsToSecond(table: String, tsCol: String): String =
    s"SELECT to_date(to_char(max($tsCol),'yyyy-mm-dd hh24:mi:ss')," +
      s"'yyyy-mm-dd hh24:mi:ss') AS last_end_time FROM $table"
}

/** Postgres rendering — bare literals, server-side cast (pg_db.R:22-28);
  * the second-truncation uses date_trunc, the idiomatic PG form of
  * nikon.py:210's Oracle round-trip. */
case object PostgresDialect extends SqlDialect {
  def tsLiteral(ts: String): String = s"'$ts'"
  def maxTsToSecond(table: String, tsCol: String): String =
    s"SELECT date_trunc('second', max($tsCol)) AS last_end_time FROM $table"
}

/** Derby rendering — ANSI TIMESTAMP() constructor (Derby has no
  * implicit text→timestamp cast and no to_timestamp/date_trunc). The
  * executable member of the family: JdbcSpec runs these against an
  * embedded Derby wire to pin row parity with the Catalyst-pushdown
  * path. */
case object DerbyDialect extends SqlDialect {
  def tsLiteral(ts: String): String = s"TIMESTAMP('$ts')"
  def maxTsToSecond(table: String, tsCol: String): String =
    // Derby lacks date_trunc/to_char; the varchar round-trip on the
    // second-resolution prefix is the same truncation contract
    s"SELECT TIMESTAMP(SUBSTR(CAST(max($tsCol) AS VARCHAR(29)), 1, 19)) " +
      s"AS last_end_time FROM $table"
}
