package graft

import graft.queries.Relational

/** The reference's own correctness idea — two physical strategies, same
  * answer (reference eda_query.py:216-231,240-257 `subquery=True/False`) —
  * promoted to a test: the hand-decorrelated 4-key semi-join and the
  * correlated-IN SQL phrasing must produce identical relations. */
class RelationalSpec extends SparkTestBase {

  test("D3 two-plans cross-check: decorrelated join == correlated IN") {
    val a = Relational.queries("q03_correlated_in")(spark, sfDir)
    val b = Relational.q03Correlated(spark, sfDir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
