package graft

/** The stride-1 family's 128-bit key widening (Dedup.wideKeys): flipping
  * the deployment flag must change ONLY the internal join key width,
  * never an output row. Pinned by building each stride-1 operator twice
  * through its EXPLICIT width parameter — default 60-bit key, then
  * full-digest struct key — and comparing the collected outputs as
  * multisets. (The 60-bit default is what the DuckDB oracle gate
  * replays; this spec is what licenses the widened form for 100 TB
  * window counts, where the 60-bit birthday bound is ~1 expected
  * collision at W ≈ 10⁹.) The width is threaded as a parameter, not a
  * JVM-global property flip, so concurrently-running suites can never
  * observe a different key width (round-17 ADVICE item).
  */
class WideKeySpec extends SparkTestBase {

  private val Stride1: Seq[(String, Boolean => org.apache.spark.sql.DataFrame)] = Seq(
    "q103_dupspan_profile" -> ((w: Boolean) => graft.queries.Dedup.q103Plan(spark, sfDir, w)),
    "q150_dupspan_strip" -> ((w: Boolean) => graft.queries.Dedup.q150Plan(spark, sfDir, w)),
    "q161_decontam_strip" -> ((w: Boolean) => graft.queries.Dedup.q161Plan(spark, sfDir, w)))

  private def collectRows(build: Boolean => org.apache.spark.sql.DataFrame,
                          wide: Boolean): Seq[String] = {
    val df = build(wide)
    try df.collect().map(_.toString).sorted.toSeq
    finally Caches.release()
  }

  for ((name, build) <- Stride1)
    test(s"$name: 128-bit window keys ≡ 60-bit output, bit for bit") {
      assert(!graft.queries.Dedup.wideKeys,
        "deployment flag set in the test JVM — the narrow arm would not be narrow")
      val narrow = collectRows(build, wide = false)
      val wide = collectRows(build, wide = true)
      assert(wide == narrow,
        s"$name output changed under wide keys: ${wide.size} vs ${narrow.size} rows")
      assert(narrow.nonEmpty, s"$name produced no rows — vacuous comparison")
    }
}
