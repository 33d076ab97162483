package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding TRAINER and frozen-merge ENCODER — the full
  * tokenizer-construction loop whose first-round statistics q70 ranks
  * (Sennrich et al. 1508.07909; the GPT-2 tokenizer recipe, Radford et
  * al. 2019). Two halves, split exactly like the PQ index family
  * (q78 train / q79 serve):
  *
  *  - [[train]] runs the real iterative algorithm — count adjacent
  *    symbol pairs over the word-TYPE relation (types weighted by
  *    occurrence count: the standard trick that makes each round's
  *    shuffle vocabulary-sized, not corpus-sized), fuse the most
  *    frequent pair everywhere, recount, repeat. Each round is one
  *    uniform pair-key aggregation (map-side combined) plus a 1-row
  *    TakeOrderedAndProject collect — control-plane by construction,
  *    the q68-audited pattern. Rounds are data-independent in count
  *    (MergeRounds) so driver actions are bounded; the per-round
  *    lineage is cut by persist-materialize-unpersist so round r
  *    rescans round r−1's cached types, never the corpus.
  *
  *  - [[encodeWord]] applies a FROZEN merge list in rank order (each
  *    merge fuses all its occurrences left-to-right — greedy BPE
  *    inference, deterministic for any partitioning). Encoding is a
  *    broadcast of ≤MergeRounds string pairs and a narrow map: zero
  *    shuffle at any scale.
  *
  * Determinism contract: the winning pair ties break on (count desc,
  * left symbol, right symbol) — engine- and partitioning-independent.
  * Training reads a deterministic doc_id-slice sample (the 100 TB
  * shape: fit the tokenizer on a sample, encode everything), encoding
  * reads every document.
  */
object Bpe {

  /** Fuse every adjacent (a, b) occurrence in `syms`, left to right:
    * "aab" with merge (a,a) → ["aa","b"]; overlaps resolve greedily
    * ("aaa" with (a,a) → ["aa","a"]). */
  def fuse(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Apply a frozen merge list in rank order to one word. */
  def encodeWord(w: String, merges: Seq[(String, String)]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
    merges.foreach { case (a, b) =>
      if (syms.length >= 2) syms = fuse(syms, a, b)
    }
    syms
  }

  /** Iterative BPE training over a (syms, cnt) word-type relation.
    * Returns the learned merges in rank order (may stop early when no
    * pair occurs at least [[minCount]] times). */
  def train(spark: SparkSession, types: DataFrame, rounds: Int,
            minCount: Long = 2L): Seq[(String, String)] = {
    import spark.implicits._
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur = types.select(col("syms"), col("cnt")).as[(Seq[String], Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var done = false
      var r = 0
      while (r < rounds && !done) {
        val best = cur.toDF("syms", "cnt")
          .filter(size(col("syms")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
            .as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("a"), col("b"))
          .limit(1)
          .collect()
        best.headOption match {
          case Some(row) if row.getLong(2) >= minCount =>
            val (a, b) = (row.getString(0), row.getString(1))
            merges += ((a, b))
            val next = cur.map { case (syms, cnt) =>
              (fuse(syms.toIndexedSeq, a, b): Seq[String], cnt)
            }.persist(StorageLevel.MEMORY_AND_DISK)
            next.count() // materialize before releasing the parent cache
            cur.unpersist()
            cur = next
          case _ => done = true
        }
        r += 1
      }
      merges.toSeq
    } finally cur.unpersist()
  }
}
