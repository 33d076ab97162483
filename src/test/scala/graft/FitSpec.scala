package graft

import breeze.linalg.DenseVector
import graft.analytics.RigidFit
import graft.analytics.RigidFit.{Fit, Site}
import org.scalatest.matchers.should.Matchers._

/** Rigid-body fit: the iterative L-BFGS-B solver (faithful to the
  * reference's optim call, R/tlcd_nikonrot.R:231-238) must agree with the
  * closed-form normal equations used by the q19 oracle query — the
  * objective (R/basic_fun.R:25-33) is linear in (sx, sy, tanθ), so both
  * find the same global minimum. */
class FitSpec extends SparkTestBase {

  /** Closed-form solution mirroring queries.Analytics.fitParams. */
  private def closedForm(sites: Seq[Site]): (Double, Double, Double) = {
    val n = sites.size.toDouble
    val sx = sites.map(_.x).sum; val sy = sites.map(_.y).sum
    val sdx = sites.map(_.dx).sum; val sdy = sites.map(_.dy).sum
    val sdyx = sites.map(s => s.dy * s.x).sum
    val sdxy = sites.map(s => s.dx * s.y).sum
    val sdx2 = sites.map(s => s.dx * s.dx).sum
    val sdy2 = sites.map(s => s.dy * s.dy).sum
    val t = (sdyx - sdxy - (sx * sdy - sy * sdx) / n) /
      (sdx2 + sdy2 - (sdx * sdx + sdy * sdy) / n)
    ((t * sdy - sx) / n, -(sy + t * sdx) / n, t)
  }

  private def synthGlass(glass: Long, seed: Int): Seq[Site] = {
    val rnd = new scala.util.Random(seed)
    // true params: shift + small rotation (µrad scale, like the tool)
    val (tsx, tsy, tTheta) = (0.3 + rnd.nextDouble(), -0.2 + rnd.nextDouble(), 50.0 * rnd.nextDouble())
    val t = math.tan(tTheta * 1e-6)
    (0 until 48).map { i =>
      val dx = (i / 6) * 10.0; val dy = (i % 6) * 10.0
      // measured diff = -(shift/rot applied to design) + noise, so the fit recovers (tsx,tsy,θ)
      val x = -tsx + dy * t + rnd.nextGaussian() * 0.01
      val y = -tsy - dx * t + rnd.nextGaussian() * 0.01
      Site(glass, x, y, dx, dy)
    }
  }

  test("L-BFGS-B matches closed-form normal equations on synthetic glasses") {
    for (g <- 0 until 5) {
      val sites = synthGlass(g, 1000 + g)
      val fit = RigidFit.fitOne(g, sites.iterator)
      val (csx, csy, ct) = closedForm(sites)
      fit.shiftX shouldBe csx +- 1e-6
      fit.shiftY shouldBe csy +- 1e-6
      math.tan(fit.thetaUrad * 1e-6) shouldBe ct +- 1e-9
    }
  }

  test("objective at solution is no worse than at truth or zero") {
    val sites = synthGlass(7, 77)
    val xs = sites.map(_.x).toArray; val ys = sites.map(_.y).toArray
    val dxs = sites.map(_.dx).toArray; val dys = sites.map(_.dy).toArray
    val obj = RigidFit.objective(xs, ys, dxs, dys) _
    val fit = RigidFit.fitOne(7, sites.iterator)
    val atFit = obj(DenseVector(fit.shiftX, fit.shiftY, fit.thetaUrad))
    assert(atFit <= obj(DenseVector(0.0, 0.0, 0.0)))
  }

  test("distributed fit over embeddings matches per-glass local fit") {
    import spark.implicits._
    val ds = RigidFit.fromEmbeddings(spark, sfDir)
    val local = ds.collect().groupBy(_.glass).map { case (g, arr) =>
      g -> RigidFit.fitOne(g, arr.iterator)
    }
    val dist = RigidFit.fit(ds).collect().map(f => f.glass -> f).toMap
    assert(dist.keySet == local.keySet)
    dist.foreach { case (g, f) =>
      val l: Fit = local(g)
      f.shiftX shouldBe l.shiftX +- 1e-8
      f.shiftY shouldBe l.shiftY +- 1e-8
    }
  }
}
