package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** The BPE trainer/encoder (q89) against a hand-computed golden run of
  * the classic Sennrich corpus, plus the invariants the rows-only
  * driver gate cannot see. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  // word-type corpus: low×5, lower×2, newest×6, widest×3. Hand-derived
  // merge sequence under the (count desc, left, right) tiebreak:
  //   r1 e+s(9)  r2 es+t(9)  r3 l+o(7)  r4 lo+w(7)
  //   r5 e+w(6)  r6 ew+est(6) r7 n+ewest(6) r8 d+est(3)
  private val Golden = Seq(
    ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
    ("e", "w"), ("ew", "est"), ("n", "ewest"), ("d", "est"))

  private def types = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    .toDF("w", "cnt")
    .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
      .as("syms"), col("cnt"))

  test("train reproduces the hand-computed golden merge list") {
    assert(Bpe.train(spark, types, 8) == Golden)
  }

  test("training stops early when no pair reaches the minimum count") {
    // after the 8 golden merges every remaining pair count is < 4
    assert(Bpe.train(spark, types, 50, minCount = 4L) == Golden.take(7))
  }

  test("frozen merges encode an UNSEEN word the classic way, and round-trip") {
    assert(Bpe.encodeWord("lowest", Golden) == IndexedSeq("low", "est"))
    // greedy left-to-right overlap resolution
    assert(Bpe.fuse(IndexedSeq("a", "a", "a"), "a", "a") == IndexedSeq("aa", "a"))
    // detokenization invariant: concatenating symbols restores the word
    for (w <- Seq("lowest", "newest", "widest", "low", "lower", "wes", "xyzzy", ""))
      assert(Bpe.encodeWord(w, Golden).mkString == w)
  }

  test("q89 output is deterministic and its counts are internally consistent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_test").toString
    // all doc_ids ≡ 0 (mod 3): the training sample IS the corpus, so
    // q70 (all docs) and q89's trainer see identical statistics
    val rows = Seq(
      (0L, "low low low low low lower lower", "en", "src0"),
      (3L, "newest newest newest newest newest newest", "en", "src1"),
      (6L, "widest widest widest", "en", "src2"),
      (9L, "lowest newest widest", "en", "src3"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val q = graft.queries.TextPipeline.queries("q89_bpe_encode")
      val out = q(spark, dir).collect()
      assert(out.length == 4)
      out.foreach { r =>
        val (nw, nc, ns, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(ns >= nw && ns <= nc, s"symbol count out of range: $r")
        assert(ppm == 1000000L * ns / nc, s"compression ppm inconsistent: $r")
      }
      // this corpus learns the same 8 golden merges (hand-checked), so
      // doc 9 encodes lowest→[low,est] newest→[newest] widest→[w,i,dest]
      val d9 = out.find(_.getLong(0) == 9L).get
      assert(d9.getLong(3) == 2 + 1 + 3, s"doc 9 symbols: $d9")
      // replay is bit-identical (merge list and encoding are deterministic)
      val again = q(spark, dir).collect()
      assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    } finally {
      graft.Caches.release()
    }
  }

  test("round 1 of the trainer agrees with q70's top-ranked pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_q70_test").toString
    val rows = Seq(
      (0L, "low low low low low lower lower", "en", "src0"),
      (3L, "newest newest newest newest newest newest", "en", "src1"),
      (6L, "widest widest widest", "en", "src2"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val top = graft.queries.TextPipeline.queries("q70_bpe_merges")(spark, dir)
        .filter(col("rank") === 1).collect().head.getString(1)
      val t = Tables.documentsWide(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"), col("cnt"))
      val m1 = Bpe.train(spark, t, 1).head
      assert(m1._1 + m1._2 == top,
        s"trainer round 1 ${m1} disagrees with q70 top pair $top")
    } finally graft.Caches.release()
  }
}
