package graft.flows

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.incremental.{IncrementalRunner, SchemaReconcile, Watermarks}

/** The reference's top-level entry point (`etlmain()` →
  * `ETL.etl('EDC_Import')` → `ETL.rot('ROT_Transform', 'EDC_Import')`,
  * reference nikon_ETL.py:627-636, 293-336, 425-499) as one composed
  * surface: replicate the shared index table, replicate each per-tool
  * raw table (with schema reconciliation against its sink — tool schemas
  * drift independently, T1), then run the windowed analytics trailing
  * the replication watermark. A user of the reference's `etlmain` runs
  * this instead.
  *
  * Per-tool processing is a driver loop (D6) because each tool has its
  * own schema and sink — but within a tool every step is a distributed
  * job, and tools could run concurrently from independent drivers (their
  * state is disjoint: per-(apname, toolid) watermark rows).
  */
object EtlMain {

  case class ToolSource(toolid: String, raw: DataFrame, sinkColumns: Seq[String], sinkPath: String)

  /** @return (index chunks run, per-tool chunks run) */
  def etl(spark: SparkSession,
          index: DataFrame, indexSinkPath: String,
          tools: Seq[ToolSource],
          wm: Watermarks, apname: String, indexToolid: String,
          now: Timestamp): (Int, Map[String, Int]) = {
    // §3.1 step 3: index table replication (dbtransfer)
    val n = IncrementalRunner.replicate(spark, index, "tstamp", indexSinkPath,
      wm, apname, indexToolid, now)
    // §3.1 step 4: per-tool replication with schema reconciliation
    val perTool = tools.sortBy(_.toolid).map { t => // sorted loop, reference nikon_ETL.py:385
      val chunks = IncrementalRunner.replicate(spark, t.raw, "tstamp", t.sinkPath,
        wm, apname, t.toolid, now,
        transform = df => SchemaReconcile.reconcile(df, t.sinkColumns))
      t.toolid -> chunks
    }.toMap
    (n, perTool)
  }

  /** §3.2: the analytics stage trailing replication — see RotRunner. */
  def rot(spark: SparkSession, raw: DataFrame, designValues: DataFrame,
          wm: Watermarks, toolid: String, rotApp: String, upstream: String,
          out: RotRunner.RotOutputs): Int =
    RotRunner.run(spark, raw, designValues, wm, toolid, rotApp, upstream, out)
}
