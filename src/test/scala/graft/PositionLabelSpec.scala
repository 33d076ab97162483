package graft

import graft.analytics.Hclust1D

/** R5 fidelity: the ward.D 1-D clusterer must agree with the sanctioned
  * sort-and-split shortcut exactly where the shortcut is valid
  * (well-separated columns), and must group by PROXIMITY — like the
  * reference's hclust — where sort-split's equal-size assumption breaks. */
class PositionLabelSpec extends SparkTestBase {

  test("ward.D cutree equals sort-and-split on well-separated columns") {
    // 4 columns at x ≈ 0, 100, 200, 300 with ±1 jitter, 6 sites each
    val xs = (0 until 24).map { i =>
      (i / 6) * 100.0 + (i % 6) * 0.3 - 0.75
    }.toArray
    // shuffle deterministically so input order isn't already sorted
    val perm = xs.indices.sortBy(i => (i * 7919) % 24)
    val shuffled = perm.map(xs).toArray
    val labels = Hclust1D.cutreeWard(shuffled, 4)
    // sort-split expectation: rank by x, id = rank / 6 + 1
    val bySort = shuffled.zipWithIndex.sortBy(_._1).zipWithIndex
      .map { case ((_, orig), rank) => orig -> (rank / 6 + 1) }.toMap
    shuffled.indices.foreach { i =>
      assert(labels(i) == bySort(i), s"site $i (x=${shuffled(i)}) mislabeled")
    }
  }

  test("ward.D groups by proximity where equal-size sort-split cannot") {
    // true structure: {0,1,2}, {10,11}, {30} — unequal cluster sizes.
    // sort-split into equal groups of 2 would yield {0,1},{2,10},{11,30}:
    // two clusters straddling a 8x-larger gap than any within-cluster
    // distance. ward.D (hand-derivable via Lance-Williams on these 6
    // points) recovers the proximity structure.
    val xs = Array(0.0, 1.0, 2.0, 10.0, 11.0, 30.0)
    assert(Hclust1D.cutreeWard(xs, 3).toSeq == Seq(1, 1, 1, 2, 2, 3))
  }

  test("labelGlass assigns reference item ids: columns by x, rank by y inside") {
    // 2 columns of 3; y decides the within-column order (W1)
    val sites = Seq(
      (101L, 0.0, 5.0), (102L, 0.2, 1.0), (103L, 0.1, 3.0),
      (201L, 50.0, 9.0), (202L, 50.2, 7.0), (203L, 50.1, 8.0))
    val out = Hclust1D.labelGlass(7L, sites, clusterSize = 3)
      .map(l => l.site_id -> (l.x_id, l.item_id)).toMap
    assert(out == Map(
      102L -> (1, 1), 103L -> (1, 2), 101L -> (1, 3),
      202L -> (2, 4), 203L -> (2, 5), 201L -> (2, 6)))
  }

  test("golden fixture: ward.D labels match an independent implementation exactly") {
    // 48 sites, 8 planted columns of 6 at x-centers 0,10,…,70 with ±4.5
    // jitter; column 5 is shifted left so columns 4/5 genuinely overlap —
    // the case where sort-split's equal-size assumption breaks and only
    // the agglomeration order decides. Expected labels precomputed by an
    // INDEPENDENT Python implementation of R's published ward.D recipe
    // (reference R/basic_fun.R:73-104: Lance-Williams on raw Euclidean
    // dissimilarities of scale(x), αi=(ni+nk)/T, β=−nk/T; cutree(k) =
    // partition after n−k merges; ids relabeled by ascending cluster
    // mean, the reference's left-to-right column order). The fixture has
    // no exact merge-criterion ties, so tie-break conventions cannot
    // hide a divergence. Note the expected sizes are 6,6,6,6,5,7,6,6 —
    // ward.D assigns the straddling site by proximity, which no
    // equal-split shortcut reproduces — and item_id 37 appears twice
    // (clusters 6 and 7), faithfully reproducing the reference's
    // (x_id−1)·6 + order(y) collision on unequal columns.
    val xs = Array(
      -3.5286, 2.8676, 2.3503, 1.3577, 3.4833, 1.5112, 10.7424, 10.0999,
      10.4251, 6.7932, 6.9428, 8.4246, 17.1876, 18.4195, 21.9205, 17.4791,
      19.0243, 21.1141, 30.9664, 27.1216, 31.3132, 31.5993, 29.6421, 26.5899,
      36.6932, 40.9513, 41.1045, 38.5438, 43.576, 41.3306, 44.4544, 47.1334,
      47.6832, 45.7377, 48.2116, 44.192, 59.0572, 56.2433, 56.0134, 57.654,
      58.1987, 60.3436, 69.4391, 73.098, 72.5781, 66.6915, 73.9591, 73.4147)
    val ys = Array(
      52.4775, 39.6275, 32.9337, 48.2225, 62.1732, 59.2833, 47.3352, 20.3465,
      49.3484, 24.895, 48.4461, 60.1975, 86.0485, 73.7027, 54.8876, 4.8629,
      59.2483, 79.2625, 17.2027, 11.9261, 26.7111, 16.6811, 67.465, 68.4503,
      60.3481, 15.3493, 56.3882, 87.463, 77.0778, 99.1774, 77.9356, 91.9406,
      57.1856, 14.3289, 81.4292, 86.2924, 50.1828, 44.4552, 71.1594, 15.3454,
      68.1661, 13.4298, 93.4943, 10.8282, 66.6772, 75.5827, 11.489, 25.356)
    val expectedXid = Array(
      1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4,
      5, 5, 5, 5, 6, 5, 6, 6, 6, 6, 6, 6, 7, 7, 7, 7, 7, 7, 8, 8, 8, 8, 8, 8)
    val expectedItem = Array(
      4, 2, 1, 3, 6, 5, 9, 7, 11, 8, 10, 12, 18, 16, 14, 13, 15, 17, 21, 19,
      22, 20, 23, 24, 27, 25, 26, 28, 33, 29, 34, 37, 32, 31, 35, 36, 40, 39,
      42, 38, 41, 37, 48, 43, 46, 47, 44, 45)
    // raw cutree on the scaled xs (labelGlass scales internally; the
    // golden implementation scaled too — scale() is part of the recipe)
    val sites = xs.indices.map(i => (i.toLong, xs(i), ys(i)))
    val out = Hclust1D.labelGlass(9L, sites).map(l => l.site_id -> l).toMap
    xs.indices.foreach { i =>
      assert(out(i.toLong).x_id == expectedXid(i),
        s"site $i x_id ${out(i.toLong).x_id} != golden ${expectedXid(i)}")
      assert(out(i.toLong).item_id == expectedItem(i),
        s"site $i item_id ${out(i.toLong).item_id} != golden ${expectedItem(i)}")
    }
  }

  test("distributed q47 keeps the reference's labeling invariants per glass") {
    // On arbitrary (non-separated) x the reference's hclust/cutree yields
    // UNEQUAL cluster sizes, and its item_id = (x_id−1)·6 + order(y) then
    // collides across columns — faithful means we reproduce that, so the
    // invariant is per-COLUMN, not a global 1..n range: each (glass,
    // x_id) of size m carries exactly (x_id−1)·6 + (1..m).
    val out = Hclust1D.labeled(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (g, rows) =>
      assert(rows.length % 6 == 0)
      val k = rows.length / 6
      rows.groupBy(_.getInt(2)).foreach { case (xid, col) =>
        assert(xid >= 1 && xid <= k, s"glass $g x_id $xid outside 1..$k")
        val items = col.map(_.getInt(3)).sorted.toSeq
        assert(items == ((xid - 1) * 6 + 1 to (xid - 1) * 6 + col.length),
          s"glass $g column $xid items: $items")
      }
    }
    // and the sized-glass population matches q18's (same n % 6 gate)
    val q18Glasses = graft.queries.Analytics.queries("q18_position_label")(spark, sfDir)
      .select("glass").distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == q18Glasses)
  }
}
