package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev measurements (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Unit): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 2)

    val docSets = docs.select(col("doc_id"), expr(
        """sort_array(array_distinct(transform(sequence(1, size(ts) - 1),
          |  i -> cast(conv(substring(md5(concat(element_at(ts, i), ' ', element_at(ts, i + 1))), 1, 15), 16, 10) AS bigint))))""".stripMargin)
        .as("set"))
      .withColumn("n", size(col("set")))
      .cache()
    val tok = docSets.select(col("doc_id"), col("n"), explode(col("set")).as("tok"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
    val prefix = tok.join(dfreq, "tok")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("df", "tok")))
      .filter(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
      .select("doc_id", "tok", "rk", "n")
      .cache()
    time("prefix-build") { prefix.write.format("noop").mode("overwrite").save() }
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id")
          && least(col("a.n"), col("b.n")) * 5 >= greatest(col("a.n"), col("b.n")) * 4
          && least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")) + 1
             >= expr("((a.n + b.n) * 4 + 8) div 9"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("cand-join") { cand.write.format("noop").mode("overwrite").save() }
    println("cand rows: " + cand.count())
    val ver = cand
      .join(docSets.select(col("doc_id").as("d1"), col("set").as("s1")), "d1")
      .join(docSets.select(col("doc_id").as("d2"), col("set").as("s2")), "d2")
      .withColumn("inter", expr("graft_inter_count(s1, s2)"))
      .withColumn("n1", size(col("s1")).cast("long"))
      .withColumn("n2", size(col("s2")).cast("long"))
      .withColumn("jaccard", round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= 0.8)
    time("full-verify") { ver.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
