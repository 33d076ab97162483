package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` for named catalog queries to files —
  * the optimization-round evidence trail (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.tools.PlanDump <dataDir> <outDir> <suffix> <query>...
  * Produces <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = new java.io.File(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    outDir.mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { nm =>
      val fn = graft.SparkEntry.queries(nm)
      val plan = fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        new java.io.File(outDir, s"${nm}_$suffix.txt").toPath, plan)
      println(s"[plandump] wrote ${nm}_$suffix.txt (${plan.length} chars)")
      graft.Caches.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
