package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN recall on a NON-GENERATOR embedding distribution — the vector
  * edition of HeapsProbe (round-20 verdict ask #3). The driver fixture's
  * embeddings are benign for ANN: the round-19 recall rows
  * (q185 sf1 0.9167 served, q122's nprobe curve) are measured on the
  * testdata generator's geometry only, and clustered/drifted corpora are
  * exactly where IVF and graph-ANN recall degrade — coarse cells go
  * Zipf-occupied (one giant cell the probe budget drowns in, empty tail
  * cells that strand their members) and a drifted slice sits off every
  * frozen pivot. This probe PLANTS that corpus deterministically and
  * runs the UNCHANGED catalog queries (q185, q122) on it, so the
  * registered config's recall claims are measured on hostile geometry,
  * not just the fixture's.
  *
  * Corpus (splitmix64-keyed, marker-gated, fixture schema
  * `(vec_id, embedding float[64], label)`):
  *  - 64 cluster centroids, coords U(−0.6, 0.6);
  *  - cluster occupancy Zipf(s = 1.1) — head cell ≈ 20% of the corpus,
  *    a long tail of near-empty cells (the skew IVF hates);
  *  - per-vector noise U(−0.15, 0.15) per coord — intra-cluster cosine
  *    ≈ 0.94, inter ≈ 0, so exact top-3 is intra-cluster and meaningful;
  *  - a DRIFTED SLICE: ~20% of vectors (q158's uniform-shift scenario)
  *    get a fixed offset of ≈ 1.7× the noise norm — shifted copies of
  *    every cluster, off every pivot;
  *  - the 8 catalog queries (vec_id < 8) cover the regimes: 0–3 drawn
  *    like any vector (≈ head clusters), 4–5 FORCED into the two
  *    rarest tail clusters, 6–7 FORCED into the drifted slice.
  *  - |coord| ≤ 0.6 + 0.15 + 0.25 = 1.0, so quantized dots stay within
  *    the driver walk's exact-Long envelope (64·(1e7)² < 2⁵³).
  *
  * Usage: runMain graft.tools.SkewedVecProbe [outRoot] [sizes...]
  * (default sizes 2000 = sf0.1-scale and 20000 = sf1-scale). Prints one
  * `[vskew]` JSON line per (size, query) with the rows and seconds —
  * the BASELINE.md skewed-corpus table next to the fixture rows.
  */
object SkewedVecProbe extends Serializable {
  import Splitmix.u01

  private val Dims = 64
  private val Clusters = 64
  private val ZipfS = 1.1
  private val DriftFrac = 0.2

  private val Queries = Seq("q185_graph_recall", "q122_nprobe_curve")

  private def zipfCdf(v: Int): Array[Double] = {
    val w = Array.tabulate(v)(r => 1.0 / math.pow(r + 1.0, ZipfS))
    val tot = w.sum
    val cdf = new Array[Double](v)
    var acc = 0.0
    var i = 0
    while (i < v) { acc += w(i) / tot; cdf(i) = acc; i += 1 }
    cdf
  }

  def main(args: Array[String]): Unit = {
    val outRoot = args.headOption.getOrElse("/tmp/graft_vskew")
    val sizes = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(2000, 20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    val cdf = zipfCdf(Clusters)
    val cent = Array.tabulate(Clusters, Dims)((c, d) =>
      (u01(c * 7907L + d * 131L + 17L) * 2 - 1) * 0.6)
    val drift = Array.tabulate(Dims)(d => (u01(d * 9973L + 5L) * 2 - 1) * 0.25)

    def clusterOf(id: Long): Int =
      if (id == 4L || id == 5L) Clusters - 1 - (id - 4L).toInt // forced tail queries
      else {
        val u = u01(id * 104729L + 7L)
        var idx = java.util.Arrays.binarySearch(cdf, u)
        if (idx < 0) idx = -idx - 1
        math.min(idx, Clusters - 1)
      }
    def drifted(id: Long): Boolean =
      id == 6L || id == 7L || u01(id * 15485863L + 3L) < DriftFrac

    def genDir(n: Int): String = {
      val out = s"$outRoot/n$n"
      val marker = new java.io.File(s"$out/_GENERATED")
      if (!marker.exists()) {
        spark.range(n.toLong).map { id =>
          val c = clusterOf(id)
          val d = drifted(id)
          val emb = Array.tabulate(Dims) { k =>
            val v = cent(c)(k) + (u01(id * 2654435761L + k * 37L + 101L) - 0.5) * 0.3 +
              (if (d) drift(k) else 0.0)
            v.toFloat
          }
          (id, emb, c)
        }.toDF("vec_id", "embedding", "label")
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
        marker.getParentFile.mkdirs()
        java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      }
      out
    }

    sizes.foreach { n =>
      val dir = genDir(n)
      // corpus shape audit: head-cell share and drifted count, so the
      // BASELINE row documents what geometry the recall was earned on
      val occ = spark.read.parquet(s"$dir/embeddings.parquet")
        .groupBy("label").count().orderBy(desc("count")).collect()
      val headShare = math.rint(occ.head.getLong(1).toDouble / n * 1e4) / 1e4
      val nDrift = (0L until n.toLong).count(drifted)
      Queries.foreach { q =>
        graft.Caches.release(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(q)(spark, dir).toJSON.collect()
        val secs = (System.nanoTime() - t0) / 1e9
        graft.Caches.release(); spark.catalog.clearCache()
        println(s"""[vskew] {"n":$n,"clusters":$Clusters,"head_share":$headShare,""" +
          s""""drifted":$nDrift,"query":"$q","sec":${math.round(secs * 100) / 100.0},""" +
          s""""rows":[${rows.mkString(",")}]}""")
      }
    }
    spark.stop()
  }
}
