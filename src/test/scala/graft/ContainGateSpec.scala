package graft

import graft.queries.{Dedup, IncrementalContain}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The containment serve's regime gate (round-17 ask #3): candidate
  * generation routes PER SHARD DOC on the frozen df spectrum — the
  * banded join where the whole rarest-first prefix sits under
  * ContainBandCap (provably lossless there), the exact join elsewhere.
  * The driver fixtures sit entirely under the cap (ContainBandedSpec's
  * premise), so the exact route would be vacuous on them; this spec
  * PLANTS both regimes side by side — a 520-copy boilerplate block
  * (every shingle df 520 > 512) next to a Heaps tail of unique docs —
  * and pins gated ≡ ungated-exact with both routes demonstrably
  * non-vacuous. */
class ContainGateSpec extends SparkTestBase {

  private val Cap = Dedup.ContainBandCap // 512

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("gated containment serve ≡ exact on a corpus spanning both df regimes") {
    val boiler = "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"
    val corpus = docsDF(
      (0L until (Cap + 8L)).map(i => i -> boiler) ++                // every shingle df 520 > cap
        (1000L until 1080L).map(i => i -> (0 until 10).map(t => s"u${i}t$t").mkString(" ")))
    val shard = docsDF(Seq(
      5000L -> "c0 c1 c2 c3 c4",          // 4 shingles, ALL over-cap -> exact route
      6000L -> (0 until 5).map(t => s"u1000t$t").mkString(" "))) // 4 shingles, df 1 -> banded route
    val sets = Dedup.shingleSetsOf(corpus)
    val postings = sets.select(col("doc_id"), explode(col("set")).as("tok"))
    val dfRel = postings.groupBy("tok").agg(count(lit(1)).as("df"))
    val shardSets = Dedup.shingleSetsOf(shard)

    // premise: the plant actually spans the cap — over-cap AND under-cap
    // tokens both exist (a regression here means the gate test is vacuous)
    val spectrum = dfRel.agg(max("df"), min("df")).head
    assert(spectrum.getLong(0) > Cap, s"no over-cap token planted: max df ${spectrum.getLong(0)}")
    assert(spectrum.getLong(1) <= Cap, "no under-cap token planted")

    def containers(gated: Boolean): Map[Long, Long] =
      IncrementalContain.corpusContainers(shardSets, postings, sets, dfRel, gated)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gated = containers(gated = true)
    val exact = containers(gated = false)
    Caches.release()
    assert(gated == exact, s"gate changed the serve: gated=$gated exact=$exact")
    // both routes non-vacuous: the boilerplate snippet's prefix is
    // entirely over-cap (only the EXACT arm can generate it), the
    // unique snippet's entirely under-cap (only the BANDED arm does)
    assert(gated.get(5000L).contains(0L),
      s"over-cap snippet not found via the exact route: $gated")
    assert(gated.get(6000L).contains(1000L),
      s"under-cap snippet not found via the banded route: $gated")
  }
}
