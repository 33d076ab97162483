package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic top-K with dense 1..K ranks, scale-safe and warning-free.
  *
  * `orderBy(...).limit(k)` compiles to TakeOrderedAndProject — a
  * per-partition partial top-K merged on the driver, so the input
  * relation (e.g. a Heaps-law-unbounded token vocabulary) is never
  * sorted on a single partition. The rank is then derived WITHOUT any
  * WindowExec: one global aggregate collects the ≤k surviving rows,
  * `sort_array` orders them by the caller's ascending key tuple, and
  * `posexplode` turns array position into rank. A window over the
  * limited rows would be semantically fine but Spark 4's
  * EliminateWindowPartitions strips even constant partition keys, so any
  * window here planwise degenerates to a partition-less WindowExec and
  * logs the single-partition warning the catalog bans; the bounded
  * aggregate sidesteps the operator entirely.
  */
object TopK {

  /** @param order   sort for the limit (e.g. `col("x").desc, col("id")`)
    * @param ascKeys the SAME total order expressed as ascending struct
    *                keys (negate numeric columns for descending); must be
    *                unique per row so `sort_array` is deterministic
    * @param cols    output columns, emitted after `rank` in this order */
  def ranked(df: DataFrame, k: Int, order: Seq[Column],
             ascKeys: Seq[Column], cols: Seq[String]): DataFrame = {
    val keyed = struct(
      ascKeys.zipWithIndex.map { case (c, i) => c.as(s"k$i") } :+
        struct(cols.map(col): _*).as("p"): _*)
    df.orderBy(order: _*).limit(k)
      .agg(sort_array(collect_list(keyed)).as("a"))
      .select(posexplode(col("a")).as(Seq("i", "r")))
      .select((col("i") + 1).cast("int").as("rank") +:
        cols.map(c => col(s"r.p.$c").as(c)): _*)
      .orderBy("rank")
  }
}
