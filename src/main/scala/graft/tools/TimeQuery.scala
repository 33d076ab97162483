package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time a subset of SparkEntry queries without running the
  * whole bench. Usage: runMain graft.tools.TimeQuery <sfDir> q32 q33 ... */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    names.foreach { prefix =>
      val matches = graft.SparkEntry.queries.filter(_._1.startsWith(prefix))
      require(matches.size == 1,
        s"prefix '$prefix' matches ${matches.size} queries: ${matches.keys.toSeq.sorted.mkString(", ")}")
      val (name, fn) = matches.head
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[time] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
