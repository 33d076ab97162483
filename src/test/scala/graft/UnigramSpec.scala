package graft

import org.apache.spark.sql.functions._
import graft.functions.Unigram

/** The unigram-LM tokenizer trainer/encoder (q164) against hand-computed
  * golden DP runs and training fixtures, plus the invariants the
  * rows-only driver gate cannot see (the q89/BpeSpec arrangement). */
class UnigramSpec extends SparkTestBase {

  import spark.implicits._

  // --- Viterbi goldens (hand-computed DP tables) ------------------------

  private val V = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.5, "c" -> -3.0)
  private val unk = Unigram.unkScoreOf(V) // min(-3) - 10 = -13

  test("viterbi picks the higher-scoring segmentation (golden DP)") {
    // "ab": piece "ab" (-1.5) beats "a"+"b" (-2.0)
    assert(Unigram.viterbi("ab", V, unk) == IndexedSeq("ab"))
    // "cab": "c"+"ab" (-4.5) beats "c"+"a"+"b" (-5.0)
    assert(Unigram.viterbi("cab", V, unk) == IndexedSeq("c", "ab"))
  }

  test("viterbi ties break toward the longer last piece") {
    // "aa" under {a:-1, aa:-2}: both splits score -2.0; the >= rule
    // with ascending length keeps the single longer piece
    assert(Unigram.viterbi("aa", Map("a" -> -1.0, "aa" -> -2.0), -13.0)
      == IndexedSeq("aa"))
  }

  test("unseen chars encode via the unk floor and round-trip") {
    assert(Unigram.viterbi("xa", V, unk) == IndexedSeq("x", "a"))
    for (w <- Seq("", "a", "xyzzy", "abcab", "cc"))
      assert(Unigram.viterbi(w, V, unk).mkString == w)
  }

  // --- Training goldens -------------------------------------------------

  test("train reproduces the hand-computed two-type golden vocabulary") {
    // types ab×10, ac×5. Seed: a 15, b 10, c 5, ab 10, ac 5 (total 45).
    // multi count 2 ≤ target → two final EM rounds only. Round 1
    // Viterbi keeps each type whole (one negative beats two), so
    // counts = {ab:10, ac:5}, total 15; chars fall to the 0.5/15 floor.
    // Round 2 reproduces the same segmentation → fixed point.
    val types = Seq(("ab", 10L), ("ac", 5L)).toDF("w", "cnt")
    val vocab = Unigram.train(spark, types)
    val exp = Map(
      "ab" -> StrictMath.log(10.0 / 15),
      "ac" -> StrictMath.log(5.0 / 15),
      "a" -> StrictMath.log(0.5 / 15),
      "b" -> StrictMath.log(0.5 / 15),
      "c" -> StrictMath.log(0.5 / 15))
    assert(vocab == exp)
  }

  test("shrink loop prunes to the target but never drops single chars") {
    val types = Seq(("abcde", 5L), ("abcdf", 4L), ("bcdea", 3L),
      ("cdeab", 2L), ("deabc", 1L)).toDF("w", "cnt")
    val vocab = Unigram.train(spark, types, seedMulti = 64, targetMulti = 2)
    assert(vocab.count(_._1.length > 1) <= 2,
      s"multi pieces not pruned to target: $vocab")
    for (c <- "abcdef".map(_.toString))
      assert(vocab.contains(c), s"single char $c pruned: $vocab")
    // every surviving piece is scored strictly above the unk floor
    val floor = Unigram.unkScoreOf(vocab)
    assert(vocab.values.forall(_ > floor))
  }

  // --- q164 end-to-end ---------------------------------------------------

  test("q164 output is deterministic and its counts are internally consistent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram_test").toString
    // all training ids ≡ 0 (mod 3): the sample IS the corpus
    val rows = Seq(
      (0L, "low low low low low lower lower", "en", "src0"),
      (3L, "newest newest newest newest newest newest", "en", "src1"),
      (6L, "widest widest widest", "en", "src2"),
      (10L, "lowest newest widest unseen", "en", "src3")) // 10 % 3 != 0: encode-only doc
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val q = graft.queries.TextPipeline.queries("q164_unigram_encode")
      val out = q(spark, dir).collect()
      assert(out.length == 4)
      out.foreach { r =>
        val (nw, nc, np, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(np >= nw && np <= nc, s"piece count out of range: $r")
        assert(ppm == 1000000L * np / nc, s"compression ppm inconsistent: $r")
      }
      // the trained vocab compresses seen words below 1 piece/char:
      // every training doc must encode with fewer pieces than chars
      for (id <- Seq(0L, 3L, 6L)) {
        val r = out.find(_.getLong(0) == id).get
        assert(r.getLong(3) < r.getLong(2), s"no compression on doc $id: $r")
      }
      // replay is bit-identical (training and encoding are deterministic)
      val again = q(spark, dir).collect()
      assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
      // the two tokenizer families publish schema-compatible relations
      // (the fertility/OOV auditors read either): same doc set, same
      // word/char columns, per-family compression columns in the same
      // position — a consumer unions them with one rename
      val bpe = graft.queries.TextPipeline.queries("q89_bpe_encode")(spark, dir).collect()
      assert(bpe.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
        out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
        "q89/q164 disagree on the tokenizer-independent columns (doc, words, chars)")
    } finally graft.Caches.release()
  }
}
