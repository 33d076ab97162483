package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINER and frozen-vocab Viterbi ENCODER — the
  * SentencePiece-family twin of [[Bpe]] (Kudo 2018, arXiv:1804.10959;
  * Kudo & Richardson 2018, arXiv:1808.06226), completing the two
  * dominant subword-tokenizer families (q89 trains the merge-list
  * family, this trains the vocabulary-probability family). Same
  * architectural split as Bpe:
  *
  *  - [[train]] runs the real iterative algorithm over the word-TYPE
  *    relation (types weighted by occurrence count — every round's
  *    shuffle is vocabulary-sized, not corpus-sized): seed a candidate
  *    vocabulary from the types' own substrings, then alternate
  *    hard-EM rounds (E: Viterbi-segment every type under the current
  *    scores, counting piece occurrences weighted by type count;
  *    M: score := ln(count/total)) with pruning rounds that drop the
  *    lowest-scoring multi-char pieces until the target size holds —
  *    the Kudo §3.2 shrink loop with the Viterbi (hard) E-step instead
  *    of forward–backward expectations. Hard EM is the documented
  *    simplification: it keeps every statistic an exact int64 count,
  *    so training is deterministic on any partitioning and any engine
  *    (no float summation order anywhere in the E-step; the only
  *    floats are ln(count/total) via StrictMath.log, bit-identical on
  *    every JVM). Single-character pieces are never pruned (the Kudo
  *    invariant that keeps every string encodable); a char whose count
  *    hits zero keeps a floor score rather than vanishing.
  *
  *  - [[viterbi]] applies a FROZEN (piece → score) vocabulary to one
  *    word: standard max-sum DP over split points, maximizing the sum
  *    of piece scores. Ties break toward the LONGER last piece
  *    (iteration order ascending in piece length with `>=`
  *    replacement) — deterministic for any input. Characters unseen at
  *    training time score [[unkScoreOf]] (vocab minimum − 10), so
  *    encoding total-coverage holds at serve time without an UNK
  *    rewrite. Encoding is a broadcast of ≤ vocab-size (String, Double)
  *    pairs and a narrow map: zero shuffle at any scale.
  *
  * Every driver action in [[train]] is bounded by the SEED vocabulary
  * size (≤ seedMulti + |training charset| rows — control-plane, the
  * q68-audited pattern, same class as Bpe.train's 1-row argmax
  * collects); per-round lineage is cut by persisting nothing — each
  * E-step is one narrow map over the (re-read, vocab-sized) cached
  * types relation plus one piece-keyed aggregation with map-side
  * combine. The 100 TB shape matches q89's: fit on a deterministic
  * document sample (types are Heaps-bounded), encode everything with
  * the broadcast frozen vocab.
  */
object Unigram {

  /** Longest candidate piece considered at seed time (and the DP's
    * inner-loop bound — Viterbi cost is O(|w|·MaxPieceLen)). */
  val MaxPieceLen = 5

  /** Multi-char seed-vocabulary size (single chars ride along for free
    * and are never pruned). */
  val SeedMulti = 256

  /** Multi-char vocabulary size the shrink loop prunes down to. */
  val TargetMulti = 128

  /** Fraction (in ppm) of surviving multi-char pieces dropped per
    * pruning round — Kudo's shrinking_factor, integer arithmetic. */
  val PrunePpm = 200000L // 20 % per round

  /** Hard-EM iterations between pruning rounds, and after the last. */
  val EmIters = 2

  /** Encode-time score of a character absent from the trained
    * vocabulary: strictly below every trained score, so an unseen char
    * never outbids a trained piece but any string stays encodable. */
  def unkScoreOf(vocab: Map[String, Double]): Double =
    if (vocab.isEmpty) -10.0 else vocab.values.min - 10.0

  /** Viterbi segmentation of one word under frozen piece scores:
    * maximize Σ score(piece). dp(j) = best score of w[0, j); at each j
    * candidate last pieces are tried in ASCENDING length with `>=`
    * replacement, so ties break toward the longer last piece —
    * deterministic everywhere. Unknown single chars score `unkScore`;
    * unknown longer substrings are not pieces. */
  def viterbi(w: String, vocab: Map[String, Double], unkScore: Double): IndexedSeq[String] = {
    val n = w.length
    if (n == 0) return IndexedSeq.empty
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var best = Double.NegativeInfinity
      var bl = 1
      var l = 1
      val lmax = math.min(MaxPieceLen, j)
      while (l <= lmax) {
        val piece = w.substring(j - l, j)
        val sc = vocab.get(piece) match {
          case Some(s) => s
          case None => if (l == 1) unkScore else Double.NegativeInfinity
        }
        if (sc != Double.NegativeInfinity) {
          val cand = dp(j - l) + sc
          if (cand >= best) { best = cand; bl = l }
        }
        l += 1
      }
      dp(j) = best
      back(j) = bl
      j += 1
    }
    // reconstruct
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { val l = back(p); out += w.substring(p - l, p); p -= l }
    out.reverseIterator.toIndexedSeq
  }

  /** One hard-EM round: Viterbi-count every piece over the weighted
    * type relation (exact int64 counts — one vocab-keyed aggregation
    * with map-side combine), then re-score ln(count/total). Multi-char
    * pieces that won zero occurrences drop out; single chars keep a
    * floor score ln(1/(2·total)) so coverage never breaks. Returns the
    * re-scored vocabulary. */
  private def emRound(spark: SparkSession, types: DataFrame,
                      vocab: Map[String, Double]): Map[String, Double] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    val unk = unkScoreOf(vocab)
    val counts = types.select(col("w"), col("cnt")).as[(String, Long)]
      .flatMap { case (w, cnt) =>
        viterbi(w, bc.value, unk).map(p => (p, cnt))
      }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .collect() // bounded: ≤ |vocab| rows by construction
      .toMap
    val total = counts.values.sum
    vocab.flatMap { case (piece, _) =>
      counts.get(piece) match {
        case Some(c) if c > 0 => Some(piece -> StrictMath.log(c.toDouble / total))
        case _ if piece.length == 1 =>
          Some(piece -> StrictMath.log(0.5 / total)) // floor: chars never vanish
        case _ => None // an unused multi-char piece prunes itself
      }
    }
  }

  /** Iterative unigram-LM training over a (w, cnt) word-type relation.
    * Seeds single chars + the [[SeedMulti]] most frequent (by summed
    * type count, ties on the piece string) substrings of length
    * 2..[[MaxPieceLen]], then alternates [[EmIters]] hard-EM rounds
    * with 20 %-shrink pruning until ≤ [[TargetMulti]] multi-char pieces
    * survive, closing with [[EmIters]] final rounds. Returns the frozen
    * (piece → ln-probability) vocabulary. */
  def train(spark: SparkSession, types: DataFrame,
            seedMulti: Int = SeedMulti, targetMulti: Int = TargetMulti): Map[String, Double] = {
    import spark.implicits._
    val t = types.select(col("w"), col("cnt")).as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Seed: every substring of every type, weighted by type count —
      // one explode + one piece-keyed sum; the collect is bounded by
      // the seed cap (multi) + charset size (singles).
      val subs = t.flatMap { case (w, cnt) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(MaxPieceLen, w.length - i)
        } yield (w.substring(i, i + l), cnt)
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _).map { case (p, c) => (p, c) }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // feeds both collects below
      val chars = subs.filter(_._1.length == 1).collect()
      val multi = subs.filter(_._1.length > 1)
        .orderBy(col("_2").desc, col("_1"))
        .limit(seedMulti).collect()
      subs.unpersist()
      val seedTotal = (chars ++ multi).map(_._2).sum
      var vocab: Map[String, Double] = (chars ++ multi).map { case (p, c) =>
        p -> StrictMath.log(c.toDouble / seedTotal)
      }.toMap

      def multiCount = vocab.count(_._1.length > 1)
      val typesDf = t.toDF("w", "cnt")
      // Kudo shrink loop: EM to fit, prune the worst-scoring tail.
      while (multiCount > targetMulti) {
        for (_ <- 1 to EmIters) vocab = emRound(spark, typesDf, vocab)
        val keepN = math.max(targetMulti,
          (multiCount * (1000000L - PrunePpm) / 1000000L).toInt)
        val keptMulti = vocab.iterator.filter(_._1.length > 1).toSeq
          .sortBy { case (p, s) => (-s, p) } // best score first; ties on the piece
          .take(keepN).map(_._1).toSet
        vocab = vocab.filter { case (p, _) => p.length == 1 || keptMulti(p) }
      }
      for (_ <- 1 to EmIters) vocab = emRound(spark, typesDf, vocab)
      vocab
    } finally t.unpersist()
  }
}
