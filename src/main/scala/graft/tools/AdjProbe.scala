package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bisection probe for the graph-ANN adjacency build's CPU: times each
  * pipeline piece (roll-up, affinity, candidate join, scored join, dot,
  * window) through the noop sink so the expensive operator is measured,
  * not guessed. Replicates the Similarity pipeline inline with the same
  * constants; read-only diagnostics, never part of any query path.
  *
  * Usage: runMain graft.tools.AdjProbe [sfDir]
  */
object AdjProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sim = graft.queries.Similarity

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); graft.Caches.release()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[adj] $name: best ${ts.min}%.2f s (runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    def vecs = sim.corpusVecs(spark, dir).select("vec_id", "qa", "n2")
    def aff = {
      val v = vecs
      val pivots = v.filter(col("vec_id") % 61 === 3)
        .select(col("vec_id").as("cell"), col("qa").as("pa"), col("n2").as("pn2"))
      v.crossJoin(broadcast(pivots))
        .withColumn("dot", expr("graft_dot(qa, pa)"))
        .withColumn("cos", col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("pn2").cast("double"))))
        .withColumn("crank", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cell"))))
        .select("vec_id", "cell", "crank")
    }

    time("corpusVecs")(vecs)
    time("affinity (crossJoin 63 pivots + window)")(aff)
    val affC = aff.persist()
    affC.count()
    val probes = affC.filter(col("crank") <= 16).select("vec_id", "cell", "crank")
    val members = affC.filter(col("crank") === 1).select(col("vec_id").as("nbr"), col("cell"))
    time("cand join only (probes x members)")(
      probes.join(members, "cell").filter(col("vec_id") =!= col("nbr")))
    val vecsC = vecs.persist(); vecsC.count()
    def scoredNoWin = probes.join(members, "cell").filter(col("vec_id") =!= col("nbr"))
      .join(vecsC.select(col("vec_id"), col("qa").as("qa1"), col("n2").as("n21")), "vec_id")
      .join(vecsC.select(col("vec_id").as("nbr"), col("qa").as("qa2"), col("n2").as("n22")), "nbr")
      .withColumn("dot", expr("graft_dot(qa1, qa2)"))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("n21").cast("double")) * sqrt(col("n22").cast("double"))))
      .select("vec_id", "cell", "crank", "nbr", "cos")
    time("scored (joins + dot), no window")(scoredNoWin)
    time("scored + window top-8")(
      scoredNoWin
        .withColumn("nrank", row_number().over(
          Window.partitionBy("vec_id", "cell").orderBy(col("cos").desc, col("nbr"))))
        .filter(col("nrank") <= 8))
    time("full graphAdj (shared scored pass)")(sim.graphAdj(spark, dir))
    spark.stop()
  }
}
