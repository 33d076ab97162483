package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet sources over the shared testdata dir.
  *
  * Maps SURVEY.md §2.1 S1–S7: the reference opens lazy singleton DB
  * connections (reference dbs/db.py:40-47, dbs/db_pg.py:39-45) and
  * materializes cursors to rows (dbs/nikon.py:5-12). In Spark the scan IS
  * the source: a parquet (or JDBC) read with a self-describing schema.
  * Every query below works unchanged against `spark.read.format("jdbc")`
  * for a real Oracle/Postgres warehouse; parquet is the test substrate.
  *
  * Scale note: parquet scans here are the unit that must prune at 100 TB —
  * all time-windowed queries filter on a timestamp column so a
  * date-partitioned layout gets partition pruning, and every query projects
  * explicit columns so the scan's ReadSchema stays narrow.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; read it as a long and truncate to microseconds (`div`, not
    * `/`: ns-since-epoch exceeds 2^53 so double division would corrupt).
    * DuckDB keeps nanoseconds — equality holds for everything coarser than
    * 1 us, which is all the engine ever compares. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
