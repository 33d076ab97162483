package graft.flows

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.RigidFit
import graft.incremental.Sinks
import graft.sources.Sources

/** The reference's ROT analytics lifecycle (SURVEY §3.2, reference
  * R/tlcd_nikonrot.R:32-123 `tlcd_nikonrot_flow`) as one composed Spark
  * flow — the end-to-end proof that the engine's modules reproduce the
  * reference's flagship pipeline without the Python→Rscript→DB hops:
  *
  *  1. clean: measurement columns (discovered by name regex, F5/P3) cast
  *     to double (F11), rows ordered by time (O2);
  *  2. P12: rows with missing measurements → dead letter, flag −1;
  *  3. P10: glasses of products without design values → flag −2;
  *  4. A5: products whose design grid is incomplete → flag −3;
  *  5. R3: melt wide coordinate columns to long sites, position-joined
  *     to the design grid (J2, broadcast — DV tables are tiny);
  *  6. R6: per-glass rigid-body L-BFGS-B fit (RigidFit; glasses whose
  *     fit fails would flag −4);
  *  7. R7: apply the fitted transform to every site;
  *  8. K7: header (per-glass fit params) + detail (per-site corrected
  *     coordinates) sharing a deterministic surrogate key.
  *
  * Scale: one broadcast join against config-sized DV tables, one shuffle
  * on glassid for the fit (≤48 sites per glass — bounded groups, no
  * skew), and narrow column math for the transform. The per-product
  * driver loop of the reference (D6) disappears: products partition the
  * same shuffled pass.
  */
object RotFlow {

  case class RotResult(header: DataFrame, detail: DataFrame, errors: DataFrame)

  /** @param raw      wide per-tool frame: (glassid, product, tstamp) +
    *                 coordinate columns matching xColRegex/yColRegex,
    *                 one row per glass, site order = column order
    * @param designValues long design grid: (product, site_idx, dx, dy)
    */
  def run(spark: SparkSession, raw: DataFrame, designValues: DataFrame,
          xColRegex: String = "^plfn_.*_x$",
          yColRegex: String = "^plfn_.*_y$"): RotResult = {
    import spark.implicits._

    // 1. discover + cast measurement columns (F5, F11)
    val xCols = Sources.columnsMatching(raw, xColRegex)
    val yCols = Sources.columnsMatching(raw, yColRegex)
    require(xCols.nonEmpty && xCols.size == yCols.size,
      s"coordinate column sets mismatched: ${xCols.size} x vs ${yCols.size} y")
    val keyCols = Seq("glassid", "product", "tstamp")
    // try_cast mirrors R's as.numeric (junk → NA → flagged −1 below);
    // an ANSI cast would abort the whole batch on one malformed cell
    val clean = raw.select((keyCols.map(col) ++
      (xCols ++ yCols).map(c => expr(s"try_cast(`$c` AS DOUBLE)").as(c))): _*)

    // 2. missing measurements → flag −1 (P12/K8)
    val (present, missingErr) = Sinks.splitMissing(clean, xCols ++ yCols)

    // 3. products without design values → flag −2 (P10)
    val dvProducts = designValues.select("product").distinct()
    val noDv = present.join(dvProducts, Seq("product"), "left_anti")
    val withDv = present.join(broadcast(dvProducts), Seq("product"), "left_semi")
    val noDvErr = Sinks.deadLetter(noDv.select(keyCols.map(col): _*), Sinks.FlagNoDesign, "no design values")

    // 4. design grid completeness per product (A5): site_idx must cover
    // exactly 1..n — count and distinct-count alone would accept an
    // offset (e.g. 0-based) grid whose rows then silently drop at the
    // position join below.
    val expected = xCols.size
    val gridOk = designValues.groupBy("product")
      .agg(count(lit(1)).as("n"), countDistinct(col("site_idx")).as("nd"),
           min(col("site_idx")).as("lo"), max(col("site_idx")).as("hi"))
      .filter(col("n") === expected && col("nd") === expected &&
              col("lo") === 1 && col("hi") === expected)
      .select("product")
    val badGrid = withDv.join(broadcast(gridOk), Seq("product"), "left_anti")
    val badGridErr = Sinks.deadLetter(badGrid.select(keyCols.map(col): _*), Sinks.FlagBadGrid, "bad design grid")
    val fitInput = withDv.join(broadcast(gridOk), Seq("product"), "left_semi")

    // 5. melt wide x/y to long sites (R3) and join the design grid (J2).
    // The melt key is the FULL measurement identity (glassid, product,
    // tstamp): a glass measured twice inside one chunk is two separate
    // fits, and dropping tstamp here would cross-join the two
    // measurements' x and y columns into one corrupted group.
    def melt(cols: Seq[String], name: String): DataFrame =
      fitInput.select(col("glassid"), col("product"), col("tstamp"),
        posexplode(array(cols.map(col): _*)).as(Seq("site0", name)))
        .withColumn("site_idx", col("site0") + 1).drop("site0")
    val sites = melt(xCols, "x")
      .join(melt(yCols, "y"), Seq("glassid", "product", "tstamp", "site_idx"))
      .join(broadcast(designValues), Seq("product", "site_idx"))

    // 6. per-measurement rigid-body fit (R6) — the typed key is
    // xxhash64 over the full (glassid, tstamp) identity: 32-bit hashing
    // would collide with ~50% odds at ~77k keys (birthday bound) and
    // silently merge two fits; 64 bits pushes that past 5e9.
    // The CHECKED fit returns failures as rows: a degenerate glass
    // (identical design points, non-finite cell, solver abort) routes
    // to flag −4 (reference R/tlcd_nikonrot.R:263-272) instead of
    // poisoning the header with garbage params or aborting the batch.
    val typed = sites.select(
        xxhash64(col("glassid"), col("tstamp")).as("glass"),
        col("glassid"), col("product"), col("tstamp"), col("site_idx"),
        col("x"), col("y"), col("dx"), col("dy"))
    val attempts = graft.Caches.track(RigidFit.fitChecked(
        typed.select("glass", "x", "y", "dx", "dy").as[RigidFit.Site]).toDF()
      .join(typed.select("glass", "glassid", "product", "tstamp").distinct(), "glass"))
      // tracked cache: split into fits + failures below — compute the fit
      // once; the runner releases it after the sinks' actions
    val fits = attempts.filter(col("ok"))
    val fitErr = attempts.filter(!col("ok"))
      .select(col("glassid"), col("product"), col("tstamp"),
        concat(lit("fit error: "), col("error")).as("description"))
      .withColumn("flag", lit(Sinks.FlagFitError))

    // 7. apply the transform (R7): x' = x + sx − dy·tan(θ·1e-6)
    val detailLong = typed.join(fits.select("glass", "shiftX", "shiftY", "thetaUrad"), "glass")
      .withColumn("t", tan(col("thetaUrad") * 1e-6))
      .withColumn("x_rs", col("x") + col("shiftX") - col("dy") * col("t"))
      .withColumn("y_rs", col("y") + col("shiftY") + col("dx") * col("t"))
      .select("glassid", "product", "tstamp", "site_idx", "x_rs", "y_rs")

    // 8. header/detail with shared deterministic key (K7)
    val header = fits.select(col("glassid"), col("product"), col("tstamp"),
      col("shiftX").as("shift_x"), col("shiftY").as("shift_y"), col("thetaUrad").as("theta_urad"),
      col("nSites").as("n_sites"))
    val (h, d) = Sinks.headerDetail(header, detailLong, Seq("glassid", "tstamp"))

    val errors = missingErr.select(col("glassid"), col("product"), col("flag"), col("description"))
      .unionByName(noDvErr.select(col("glassid"), col("product"), col("flag"), col("description")))
      .unionByName(badGridErr.select(col("glassid"), col("product"), col("flag"), col("description")))
      .unionByName(fitErr.select(col("glassid"), col("product"), col("flag"), col("description")))
    RotResult(h, d, errors)
  }
}
