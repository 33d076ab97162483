package graft

/** The stride-1 family's 128-bit key widening (Dedup.wideKeys): flipping
  * the deployment flag must change ONLY the internal join key width,
  * never an output row. Pinned by running each stride-1 operator twice —
  * default 60-bit key, then full-digest struct key — and comparing the
  * collected outputs as multisets. (The 60-bit default is what the
  * DuckDB oracle gate replays; this spec is what licenses the widened
  * form for 100 TB window counts, where the 60-bit birthday bound is
  * ~1 expected collision at W ≈ 10⁹.)
  */
class WideKeySpec extends SparkTestBase {

  private val Stride1 = Seq(
    "q103_dupspan_profile", "q150_dupspan_strip", "q161_decontam_strip")

  private def collectRows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    try df.collect().map(_.toString).sorted.toSeq
    finally Caches.release()
  }

  for (name <- Stride1)
    test(s"$name: 128-bit window keys ≡ 60-bit output, bit for bit") {
      assert(!graft.queries.Dedup.wideKeys, "flag leaked from another test")
      val narrow = collectRows(name)
      sys.props("graft.dedup.widekeys") = "true"
      val wide =
        try collectRows(name)
        finally sys.props.remove("graft.dedup.widekeys")
      assert(wide == narrow,
        s"$name output changed under wide keys: ${wide.size} vs ${narrow.size} rows")
      assert(narrow.nonEmpty, s"$name produced no rows — vacuous comparison")
    }
}
