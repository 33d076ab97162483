package graft

/** Contract invariants for every registered query module. */
class ModuleSpec extends SparkTestBase {

  test("every oracle key has a queries entry") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o -- q}")
  }

  test("query names are unique across modules") {
    // flatMap(_.queries).toMap silently drops duplicates; catch collisions.
    val mods = Seq(queries.Relational, queries.Analytics, queries.IncrementalQueries,
      queries.Dedup, queries.Similarity, queries.TextPipeline)
    val all = mods.flatMap(_.queries.keys)
    assert(all.distinct.sizeIs == all.size,
      s"duplicate names: ${all.diff(all.distinct).distinct}")
  }

  test("all queries run on sf0.001 and are non-degenerate") {
    val empty = Seq("q18_position_label") // sf0.001 may not satisfy its n%6 guard
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      if (!empty.contains(name)) assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
