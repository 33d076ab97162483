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
