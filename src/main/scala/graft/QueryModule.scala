package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A group of named queries plus their DuckDB oracle SQL.
  * Invariant enforced by ModuleSpec tests: every oracle key exists in
  * `queries`, and column names/order match between the Spark result and
  * the SQL (the driver's hash compare sorts columns by name).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

/** Determinism helpers shared by all modules.
  *
  * The driver hash-compares Spark parquet output against DuckDB executing
  * the oracle SQL, so floating-point results must be bit-identical across
  * two engines. Rules used throughout:
  *  - sums of monetary/measure doubles accumulate in DECIMAL (exact,
  *    order-insensitive) and are emitted as DOUBLE (exact conversion);
  *  - averages/variances are derived from exact decimal moments with a
  *    fixed IEEE expression tree (identical bits on both engines);
  *  - genuinely order-sensitive reductions are rounded to >= 4 decimal
  *    places, far above the ~1e-13 reassociation noise.
  */
object QueryUtil {
  /** Order-insensitive exact sum of a 2-decimal measure column, as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact mean: decimal-exact sum divided by count (deterministic IEEE). */
  def dmean(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** SQL fragment equivalents for the DuckDB oracle. */
  def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlDmean(expr: String, scale: Int = 2): String =
    s"(${sqlDsum(expr, scale)} / COUNT($expr))"
}
