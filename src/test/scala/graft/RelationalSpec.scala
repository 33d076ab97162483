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

  test("T2 two-plans cross-check: left-anti join == except") {
    val a = Relational.queries("q26_anti_join")(spark, sfDir)
    val b = Relational.q26Except(spark, sfDir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("S6/F5: id-list source and column-regex selection") {
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/ids.csv"),
      " 1 \n2\n\n3\n2\n")
    val ids = Sources.idList(spark, s"$dir/ids.csv")
    assert(ids.collect().map(_.getString(0)).sorted.toSeq == Seq("1", "2", "3"))

    val li = Tables.lineitem(spark, sfDir)
    val measureCols = Sources.columnsMatching(li, "^l_(quantity|extendedprice|discount|tax)$")
    assert(measureCols.toSet == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val sel = Sources.selectMatching(li, Seq("l_orderkey"), "^l_.*date$")
    assert(sel.columns.toSeq == Seq("l_orderkey", "l_shipdate"))
  }
}
