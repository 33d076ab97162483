package graft.tools

import org.apache.spark.sql.SparkSession

/** Graph-ANN walk Q-scaling probe — the measurement behind the serve's
  * [[graft.queries.Similarity.GraphDriverWalkMaxQ]] gate (round-17
  * verdict ask #4a: "batch the walk ... or put a measured Q-scaling
  * bound on record").
  *
  * Both arms walk the SAME graph with the SAME arithmetic
  * (GraphAnnSpec pins bit-equal frontiers); what differs is WHERE the
  * per-round beam selection runs:
  *  - driver walk: per-round bounded `isin` fetches + plain-Scala beam
  *    — ~10 light jobs regardless of Q, but the fetch lists and the
  *    selection loop grow linearly in Q ON THE DRIVER;
  *  - batched walk: one eager Spark job per round over a distributed
  *    (qid, vec_id) frontier relation — per-job overhead is ~constant,
  *    so it amortizes once the frontier carries thousands of rows.
  * The probe times both at Q = 8 / 64 / 256 / 1024 queries (best-of-2,
  * cold caches per run) over the driver embeddings and asserts once at
  * Q = 256 that the final frontiers agree. The crossover in this table
  * is what licenses GraphDriverWalkMaxQ: catalog-sized workloads serve
  * through the measured-faster driver walk, bulk workloads (mining,
  * recall sweeps) through the relational rounds.
  *
  * Usage: runMain graft.tools.GraphWalkProbe [sfDir] [Q...]
  * Prints one `[gwalk]` JSON line per Q.
  */
object GraphWalkProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.tail.map(_.toLong).toSeq else Seq(8L, 64L, 256L, 1024L)
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

    def best2(run: () => Long): (Double, Long) = {
      val rs = (1 to 2).map { _ =>
        graft.Caches.release(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = run()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (rs.map(_._1).min, rs.head._2)
    }

    qs.foreach { q =>
      val (tDrv, nDrv) = best2(() =>
        sim.graphFrontiers(spark, dir, numQueries = q).last.size.toLong)
      val (tBat, nBat) = best2(() =>
        sim.graphFrontiersBatched(spark, dir, numQueries = q).count())
      if (q == 256L) {
        graft.Caches.release(); spark.catalog.clearCache()
        val d = sim.graphFrontiers(spark, dir, numQueries = q).last.toSet
        graft.Caches.release(); spark.catalog.clearCache()
        val b = sim.graphFrontiersBatched(spark, dir, numQueries = q)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        require(d == b, s"arms diverged at Q=$q: ${(d -- b).take(3)} / ${(b -- d).take(3)}")
        graft.Caches.release(); spark.catalog.clearCache()
      }
      println(s"""[gwalk] {"q":$q,"driver_sec":${math.round(tDrv * 1000) / 1000.0},""" +
        s""""batched_sec":${math.round(tBat * 1000) / 1000.0},"rows_driver":$nDrv,"rows_batched":$nBat}""")
    }
    spark.stop()
  }
}
