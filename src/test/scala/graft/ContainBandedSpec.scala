package graft

/** q180/q181 contracts beyond the oracle's value equality: the banded
  * scale twin's output is a SUBSET of q172's exact pairs (precision 1 by
  * construction — every banded candidate passes the same integer
  * containment verification), and the q181 recall row is exactly the
  * arithmetic of the two pair sets it claims to measure. On the test
  * corpora every token sits under ContainBandCap, so recall here is 1.0
  * — the sf1/Heaps-regime decay is a BASELINE.md measurement, not a
  * spec concern. */
class ContainBandedSpec extends SparkTestBase {

  private def pairs(name: String): Set[(Long, Long)] = {
    val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.release()
    rows
  }

  test("banded containment pairs ⊆ exact pairs, and full recall under the cap") {
    val exact = pairs("q172_containment_dedup")
    val banded = pairs("q180_contain_banded")
    assert(exact.nonEmpty, "fixture has no containment pairs — vacuous")
    assert(banded.subsetOf(exact),
      s"banded emitted non-exact pairs: ${banded -- exact}")
    assert(banded == exact,
      "at test scale every token is under ContainBandCap — recall must be 1.0")
  }

  test("q181 recall row is the exact arithmetic of the two pair sets") {
    val exact = pairs("q172_containment_dedup")
    val banded = pairs("q180_contain_banded")
    val r = SparkEntry.queries("q181_contain_recall")(spark, sfDir).collect().head
    Caches.release()
    assert(r.getLong(0) == exact.size, s"n_exact ${r.getLong(0)} != ${exact.size}")
    assert(r.getLong(1) == banded.size)
    assert(r.getLong(2) == (exact & banded).size)
    assert(r.getDouble(3) ==
      math.rint((exact & banded).size.toDouble / math.max(exact.size, 1) * 1e6) / 1e6)
  }
}
