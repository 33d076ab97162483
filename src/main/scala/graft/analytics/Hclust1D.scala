package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Faithful 1-D agglomerative hierarchical clustering with R's `ward.D`
  * semantics — the fidelity path for position labeling (R5, reference
  * R/basic_fun.R:73-104: `hclust(dist(scale(x)), "ward.D")` +
  * `cutree(k = n/6)`).
  *
  * The production path (queries.Analytics q18) is sort-and-split, exactly
  * equivalent when x-columns are well separated (the fab geometry, and
  * what PositionLabelSpec proves on separated data). THIS implementation
  * reproduces the reference algorithm itself — Lance–Williams updates
  * with ward.D coefficients over the *Euclidean* (not squared)
  * dissimilarities, matching R's classic ward.D behavior — so overlapping
  * or unevenly-sized x-clusters degrade exactly like the reference
  * degrades, instead of silently mislabeling by sort order.
  *
  * Scale: runs per glass inside `mapGroups` — ≤48 sites per glass
  * (P9 filter), so the O(n³) agglomeration is ~1e5 flops per group,
  * bounded and skew-free; the glass key is the only shuffle.
  */
object Hclust1D {

  /** Agglomerative ward.D clustering of 1-D points into k clusters
    * (= cutree(hclust(dist(x), "ward.D"), k)). Returns a cluster id per
    * input index; ids are 1..k ordered by ascending cluster mean.
    * Ties in the merge criterion break on the lower pair index
    * (deterministic; R's internal tie order can differ on exact ties,
    * which for continuous measurements occur with probability 0). */
  def cutreeWard(xs: Array[Double], k: Int): Array[Int] = {
    val n = xs.length
    require(k >= 1 && k <= n, s"k=$k out of range for n=$n")
    // dissimilarity matrix (Euclidean in 1-D = |xi - xj|), updated in
    // place by Lance-Williams as clusters merge
    val d = Array.tabulate(n, n)((i, j) => math.abs(xs(i) - xs(j)))
    val size = Array.fill(n)(1)
    val active = Array.fill(n)(true)
    val member = Array.tabulate(n)(i => List(i))
    var clusters = n
    while (clusters > k) {
      // find the minimum-dissimilarity active pair
      var bi = -1; var bj = -1; var best = Double.MaxValue
      var i = 0
      while (i < n) {
        if (active(i)) {
          var j = i + 1
          while (j < n) {
            if (active(j) && d(i)(j) < best) { best = d(i)(j); bi = i; bj = j }
            j += 1
          }
        }
        i += 1
      }
      // merge bj into bi; Lance-Williams ward.D update for every other
      // active cluster ck: d(bi∪bj, ck) =
      //   ((ni+nk) d(bi,ck) + (nj+nk) d(bj,ck) − nk d(bi,bj)) / (ni+nj+nk)
      val ni = size(bi); val nj = size(bj)
      var c = 0
      while (c < n) {
        if (active(c) && c != bi && c != bj) {
          val nk = size(c)
          val v = ((ni + nk) * d(bi)(c) + (nj + nk) * d(bj)(c) - nk * d(bi)(bj)) /
            (ni + nj + nk).toDouble
          d(bi)(c) = v; d(c)(bi) = v
        }
        c += 1
      }
      size(bi) = ni + nj
      member(bi) = member(bi) ::: member(bj)
      active(bj) = false
      clusters -= 1
    }
    // label clusters 1..k by ascending mean x (reference orders position
    // columns left-to-right before assigning ids)
    val groups = (0 until n).filter(active).map(member)
      .sortBy(m => (m.map(xs).sum / m.size, m.min)) // min-index tiebreak for equal means
    val out = new Array[Int](n)
    groups.zipWithIndex.foreach { case (m, gi) => m.foreach(out(_) = gi + 1) }
    out
  }

  case class SitePoint(glass: Long, site_id: Long, x: Double, y: Double)
  case class LabeledSite(glass: Long, site_id: Long, x_id: Int, item_id: Int)

  /** Label one glass's sites: z-score x (scale(), R/basic_fun.R:83 — a
    * monotone transform, kept for numeric fidelity), ward.D-cluster into
    * n/clusterSize columns, then item_id = (x_id−1)·clusterSize +
    * rank-of-y within the column (W1, R/basic_fun.R:93-101). */
  def labelGlass(glass: Long, sitesIn: Seq[(Long, Double, Double)],
                 clusterSize: Int = 6): Seq[LabeledSite] = {
    // Canonical input order (x, then site_id): merge-criterion ties and
    // equal-mean cluster ties in cutreeWard break on index order, and the
    // iterator order a flatMapGroups group arrives in is shuffle-fetch
    // order — NOT stable across runs. Tied x values (quantized/repeated
    // measurements) would otherwise label nondeterministically.
    val sites = sitesIn.sortBy(p => (p._2, p._1))
    val n = sites.size
    require(n % clusterSize == 0, s"n=$n not divisible by $clusterSize") // reference aborts too
    val xsRaw = sites.map(_._2).toArray
    val mean = xsRaw.sum / n
    val sd = math.sqrt(xsRaw.map(v => (v - mean) * (v - mean)).sum / math.max(n - 1, 1))
    val xs = if (sd == 0) xsRaw else xsRaw.map(v => (v - mean) / sd)
    val xid = cutreeWard(xs, n / clusterSize)
    sites.zipWithIndex
      .groupBy { case (_, i) => xid(i) }
      .toSeq
      .flatMap { case (g, mem) =>
        mem.sortBy { case ((sid, _, y), _) => (y, sid) }.zipWithIndex.map {
          case (((sid, _, _), _), rank) =>
            LabeledSite(glass, sid, g, (g - 1) * clusterSize + rank + 1)
        }
      }
  }

  /** Distributed labeling: one shuffle on the glass key, ward.D per
    * group. Input columns: (glass, site_id, x, y). */
  def label(sites: Dataset[SitePoint], clusterSize: Int = 6): Dataset[LabeledSite] = {
    import sites.sparkSession.implicits._
    sites.groupByKey(_.glass).flatMapGroups { (g, it) =>
      labelGlass(g, it.map(p => (p.site_id, p.x, p.y)).toSeq, clusterSize).iterator
    }
  }

  /** q18's input shape over the ward.D path (no DuckDB oracle — an
    * iterative agglomeration isn't SQL-expressible; PositionLabelSpec
    * carries the correctness contract instead). */
  def labeled(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wSite = Window.partitionBy("glass").orderBy("y", "event_id")
    val ev = graft.Tables.events(s, dir)
      .select(col("user_id").as("glass"), col("event_id"),
              col("value").as("x"), col("ts").as("y"))
      .withColumn("site_name", row_number().over(wSite))
      .filter(col("site_name") <= 48)
    val sized = ev.groupBy("glass").agg(count(lit(1)).as("n"))
      .filter(col("n") % 6 === 0).select("glass")
    val pts = ev.join(sized, "glass")
      .select(col("glass"), col("event_id").as("site_id"), col("x"),
        unix_micros(col("y")).cast("double").as("y"))
      .as[SitePoint]
    label(pts).toDF()
      .select(col("glass"), col("site_id").as("event_id"), col("x_id"), col("item_id"))
      .orderBy("glass", "item_id")
  }
}
