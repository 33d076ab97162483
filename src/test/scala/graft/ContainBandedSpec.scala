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
    // Assert the premise FIRST: full recall is only guaranteed when every
    // corpus token sits under the df cap. A fixture regeneration that
    // pushes one shingle over the cap should fail HERE, with the actual
    // cause, not downstream with a misleading "recall must be 1.0".
    val maxDf = graft.queries.Dedup.containMaxDf(spark, sfDir)
    Caches.release()
    assert(maxDf <= graft.queries.Dedup.ContainBandCap,
      s"fixture premise broken: max shingle df $maxDf exceeds " +
        s"ContainBandCap ${graft.queries.Dedup.ContainBandCap} — the banded arm " +
        "legitimately loses recall at this fixture scale; re-pin the fixture")
    val exact = pairs("q172_containment_dedup")
    val banded = pairs("q180_contain_banded")
    assert(exact.nonEmpty, "fixture has no containment pairs — vacuous")
    assert(banded.subsetOf(exact),
      s"banded emitted non-exact pairs: ${banded -- exact}")
    assert(banded == exact,
      "every token is under ContainBandCap (asserted above) — recall must be 1.0")
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
