package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scatter-gather window-serve recall probe for the incremental
  * graph-ANN family (q190's serving shape): how much recall does
  * serving a corpus as TWO self-contained era indexes (each with its
  * own frozen coarse layer, walks merged by exact global re-rank) give
  * up against ONE index built over the same vectors? This is the
  * question a sharded/TTL deployment actually prices: era-granular
  * state buys retirement-by-unlisting (q190) at whatever recall delta
  * this probe measures.
  *
  * Arms (same base roster = vec_id % 5 <> 4, same walk config):
  *  - single: the q188 base index (one coarse layer over everything);
  *  - window: era 0 (even) + era 1 (odd) generations, scatter-gather.
  * Recall@3 vs the exact cosine top-3 over the base roster.
  *
  * Usage: runMain graft.tools.GannWindowProbe [sfDir...]
  * Prints one `[gwin]` line per dir.
  */
object GannWindowProbe {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.queries.IncrementalGraphAnn
    val sim = graft.queries.Similarity

    dirs.foreach { dir =>
      val base = col("vec_id") % 5 =!= 4
      val single = g.buildIndex(spark, dir)
      val g0 = g.buildGenIndex(spark, dir, base && col("vec_id") % 2 === 0,
        g.eraPath(spark, dir, "0"))
      val g1 = g.buildGenIndex(spark, dir, base && col("vec_id") % 2 === 1,
        g.eraPath(spark, dir, "1"))
      val qP = g.stageQueries(spark, dir)
      val vecs = sim.corpusVecs(spark, dir).select("vec_id", "qa", "n2")
        .filter(base).cache()
      val queriesV = spark.read.parquet(s"$qP/vecs")
        .select(col("vec_id").as("qid"), col("qa").as("qq"), col("n2").as("n2q"))
      val exact = vecs.crossJoin(broadcast(queriesV))
        .filter(col("qid") =!= col("vec_id"))
        .withColumn("dot", expr("graft_dot(qq, qa)"))
        .withColumn("cos", sim.cosine(col("dot"), col("n2q"), col("n2")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rank") <= sim.GraphK)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(paths: Seq[String]): Double = {
        val served = g.windowServe(spark, paths, qP).select("qid", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact & served).size.toDouble / exact.size
      }
      val rs = recall(Seq(single))
      val rw = recall(Seq(g0, g1))
      vecs.unpersist()
      graft.Caches.release(); spark.catalog.clearCache()
      println(s"""[gwin] {"dir":"$dir","recall_single":${math.rint(rs * 1e6) / 1e6},""" +
        s""""recall_window":${math.rint(rw * 1e6) / 1e6}}""")
    }
    spark.stop()
  }
}
