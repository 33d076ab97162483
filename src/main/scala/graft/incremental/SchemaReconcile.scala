package graft.incremental

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Dynamic-schema reconciliation for per-tool tables (T1/S9, reference
  * nikon_ETL.py:157-168 `column_state` + clean_edcdata at :184-208).
  *
  * The reference replicates wide per-tool tables whose column sets drift:
  * before inserting it diffs source columns against the sink schema and
  *  - drops columns only the SOURCE has (`add` — sink can't store them),
  *  - refuses to proceed if the SINK has columns the source lacks (`del` —
  *    an insert would leave them undefined).
  * The exact ret/add/del truth table is preserved below; see
  * IncrementalSpec for the four cases.
  */
object SchemaReconcile {

  /** ret=false iff the sink has columns the source lacks. */
  case class ColumnState(ret: Boolean, add: Seq[String], del: Seq[String])

  /** Mirrors reference nikon_ETL.py:157-168 (edc = source, schema = sink).
    * Order within add/del is normalized for determinism (the reference's
    * Python set order is arbitrary). */
  def columnState(source: Seq[String], sink: Seq[String]): ColumnState = {
    val add = (source.toSet -- sink.toSet).toSeq.sorted
    val del = (sink.toSet -- source.toSet).toSeq.sorted
    ColumnState(ret = del.isEmpty, add = add, del = del)
  }

  /** Project `df` onto the sink schema, in sink column order — the Spark
    * form of clean_edcdata. Throws (like the reference's ret=False path
    * aborting the tool) when the sink expects columns the source lacks. */
  def reconcile(df: DataFrame, sinkCols: Seq[String]): DataFrame = {
    val st = columnState(df.columns.toSeq, sinkCols)
    require(st.ret, s"sink columns missing from source: ${st.del.mkString(", ")}")
    df.select(sinkCols.map(col): _*)
  }

  /** Sink schemas arrive uppercased in the reference
    * (clean_schemacolnames, nikon_ETL.py:210-212). */
  def normalizeColNames(cols: Seq[String]): Seq[String] = cols.map(_.toUpperCase)
}
