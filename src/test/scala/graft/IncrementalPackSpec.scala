package graft

import org.apache.spark.sql.DataFrame
import graft.queries.IncrementalPack

/** The q128 contracts the DuckDB oracle cannot see: boundary-sequence
  * identity against a driver-side from-scratch repack (partial-tail AND
  * exact-divisible corpora), ingest determinism on replay, the
  * frozen-prefix invariant, and the multi-day chain staying equal to
  * the full repack. Fixtures are synthetic docs with EXACT token
  * counts so the 2048-token boundary lands where each test needs it. */
class IncrementalPackSpec extends SparkTestBase {

  private val SeqLen = IncrementalPack.SeqLen.toInt

  private def withTempRoot[A](f: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_pack_test")
    try f(root.toString) finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** doc i with exactly n tokens "d<i>_<j>" — no spaces inside tokens,
    * so split/join round-trips and the driver replay is exact. */
  private def doc(id: Long, n: Int): (Long, String) =
    (id, (0 until n).map(j => s"d${id}_$j").mkString(" "))

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The from-scratch pack, computed in plain Scala (independent of
    * every Spark formulation): concatenate docs in id order, chunk at
    * SeqLen, report q127's row per chunk. */
  private def replay(rows: Seq[(Long, String)]): Seq[(Long, Int, Int, Long, Long, Long, String)] = {
    val toks = rows.sortBy(_._1).flatMap { case (id, t) => t.split(" ").map(tok => (id, tok)) }
    toks.zipWithIndex.groupBy(_._2 / SeqLen).toSeq.sortBy(_._1).map { case (seq, elems) =>
      val ids = elems.map(_._1._1)
      (seq.toLong, elems.size, ids.distinct.size, ids.min, ids.max,
        1000000L * elems.size / SeqLen, md5hex(elems.map(_._1._2).mkString(" ")))
    }
  }

  private def served(shard: Seq[(Long, String)], idx: String) =
    IncrementalPack.serve(spark, docsDf(shard), idx).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6))).toSeq

  private def artifactContent(p: String) = (
    spark.read.parquet(s"$p/seqs").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getString(5))).toSet,
    spark.read.parquet(s"$p/state").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSeq)

  // corpus: 3000 tokens → one full sequence + a 952-token tail the
  // first shard doc must finish; shard: 5000 tokens → the new total
  // 8000 ends mid-sequence again (tail 1904) for the chain test.
  private val corpus = Seq(doc(1, 1200), doc(2, 900), doc(3, 900))
  private val day1 = Seq(doc(101, 2500), doc(102, 1500), doc(103, 1000))
  private val day2 = Seq(doc(201, 300), doc(202, 2000))

  test("an EMPTY day's shard preserves the stored tail through serve and ingest") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      // serve of an empty shard = exactly the from-scratch pack of the
      // corpus alone, INCLUDING the 952-token partial boundary row
      val got = served(Seq.empty, idx)
      assert(got == replay(corpus),
        s"empty-shard serve lost rows:\n got=$got\n exp=${replay(corpus)}")
      assert(got.exists(_._2 < SeqLen), "the partial tail row must survive an empty day")
      // ingest of the empty day advances nothing and corrupts nothing:
      // the state row (frozen total + exact tail) is preserved
      val g1 = IncrementalPack.ingest(spark, docsDf(Seq.empty), idx, s"$root/gen1")
      assert(artifactContent(g1) == artifactContent(idx),
        "empty-day ingest must be a content no-op")
      // and a real day after the empty day still chains correctly
      val g2 = IncrementalPack.ingest(spark, docsDf(day1), g1, s"$root/gen2")
      val straight = IncrementalPack.ingest(spark, docsDf(day1), idx, s"$root/straight")
      assert(artifactContent(g2) == artifactContent(straight),
        "the chain through an empty day diverged from the straight chain")
    }
  }

  test("incremental serve equals the from-scratch repack, boundary stitch included") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      val got = served(day1, idx)
      val want = replay(corpus ++ day1)
      assert(got == want, s"serve differs from replay:\n got=$got\nwant=$want")
      // non-vacuous: the boundary sequence (seq 1) must mix corpus and
      // shard docs — that is the stitch under test
      val boundary = got.find(_._1 == 1L).get
      assert(boundary._4 <= 3L && boundary._5 >= 101L,
        s"boundary sequence does not span the corpus/shard seam: $boundary")
    }
  }

  test("exact-divisible corpus: empty tail, append starts a fresh sequence") {
    withTempRoot { root =>
      val evenCorpus = Seq(doc(1, 2048), doc(2, 2048))
      val idx = IncrementalPack.buildPackState(spark, docsDf(evenCorpus), s"$root/gen0")
      val (_, state) = artifactContent(idx)
      assert(state == Seq((4096L, "", 0, -1L, -1L)), s"state not an empty tail: $state")
      val got = served(day2, idx)
      assert(got == replay(evenCorpus ++ day2))
      // the first shard-born sequence must contain shard docs only
      val fresh = got.find(_._1 == 2L).get
      assert(fresh._4 >= 201L, s"fresh boundary leaked corpus docs: $fresh")
    }
  }

  test("ingest freezes filled sequences, advances state, and replays content-identically") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      val g1 = IncrementalPack.ingest(spark, docsDf(day1), idx, s"$root/gen1")
      val g1b = IncrementalPack.ingest(spark, docsDf(day1), idx, s"$root/gen1b")
      assert(artifactContent(g1) == artifactContent(g1b),
        "re-running the day against the same input generation changed the artifact")
      val (seqs0, _) = artifactContent(idx)
      val (seqs1, state1) = artifactContent(g1)
      assert(seqs0.subsetOf(seqs1), "ingest rewrote a frozen full sequence")
      assert(state1.head._1 == 8000L, s"state total not advanced: ${state1.head}")
      assert(seqs1.size == 3 && seqs0.size == 1,
        s"expected 1 frozen → 3 frozen (8000 tokens = 3 full + tail): ${seqs0.size} → ${seqs1.size}")
      // same-path replay is a publish no-op
      IncrementalPack.ingest(spark, docsDf(day1), idx, s"$root/gen1")
      assert(artifactContent(g1) == artifactContent(g1b))
    }
  }

  test("streaming pack-intake twin emits exactly the batch chain's frozen-sequence delta") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    import spark.implicits._
    withTempRoot { root =>
      // batch chain: gen0 (corpus) → gen1 (day 1) → gen2 (day 2)
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      val g1 = IncrementalPack.ingest(spark, docsDf(day1), idx, s"$root/gen1")
      val g2 = IncrementalPack.ingest(spark, docsDf(day2), g1, s"$root/gen2")
      val (seqs0, _) = artifactContent(idx)
      val (seqs2, state2) = artifactContent(g2)
      val expectedDelta = seqs2 -- seqs0
      assert(expectedDelta.size >= 3, s"fixture too small to test emission: $expectedDelta")
      // stream: same two days as micro-batches, state seeded from gen0
      val st0 = spark.read.parquet(s"$idx/state").collect().head
      val init = Streams.PackState(st0.getLong(0), st0.getString(1), st0.getInt(2),
        st0.getLong(3), st0.getLong(4))
      val mem = MemoryStream[Streams.PackDoc]
      val query = Streams.packIntake(mem.toDS(), init)
        .writeStream.format("memory").queryName("pack_stream")
        .outputMode("append").start()
      try {
        mem.addData(day1.map(d => Streams.PackDoc(d._1, d._2)).toIndexedSeq: _*)
        query.processAllAvailable()
        mem.addData(day2.map(d => Streams.PackDoc(d._1, d._2)).toIndexedSeq: _*)
        query.processAllAvailable()
      } finally query.stop()
      val streamed = spark.table("pack_stream").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toSet
      assert(streamed == expectedDelta,
        s"stream emissions differ from the batch frozen-sequence delta:\n" +
          s" stream=$streamed\n  batch=$expectedDelta")
      // the partial left in stream state is the batch tail: conservation
      // pins it — emitted full tokens + batch tail count = total appended
      val emittedToks = streamed.toSeq.map(_._2.toLong).sum
      assert(emittedToks + state2.head._1 % IncrementalPack.SeqLen ==
        state2.head._1 - seqs0.size * IncrementalPack.SeqLen,
        "token conservation between emissions and the final tail failed")
    }
  }

  test("docspans roster equals the replay and stays valid across ingest") {
    // the q139 surface: (doc -> first_seq/last_seq) from the artifact
    // must match a plain concatenate-in-id-order walk, and APPEND must
    // leave stored spans untouched (a doc's tokens never move — the
    // immobility that makes pack removal a rewrite, q139's contract)
    def replaySpans(rows: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
      var off = 0L
      rows.sortBy(_._1).map { case (id, t) =>
        val n = t.split(" ").length
        val s0 = off; off += n
        id -> ((s0 / SeqLen, (s0 + n - 1) / SeqLen))
      }.toMap
    }
    def spans(p: String): Map[Long, (Long, Long)] =
      spark.read.parquet(s"$p/docspans").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      val s0 = spans(idx)
      assert(s0 == replaySpans(corpus), s"corpus roster drifted: $s0")
      // fixture sanity: doc 1 (1200 toks) ends mid-seq-0, doc 2 straddles
      assert(s0(1L) == ((0L, 0L)) && s0(2L) == ((0L, 1L)))
      val g1 = IncrementalPack.ingest(spark, docsDf(day1), idx, s"$root/gen1")
      val s1 = spans(g1)
      assert(s1 == replaySpans(corpus ++ day1), s"post-ingest roster drifted: $s1")
      // frozen spans byte-identical under append
      assert(s0.forall { case (k, v) => s1(k) == v },
        "ingest moved a stored doc's span")
    }
  }

  test("q145 pad-rewrite: holes exactly the removed spans, untouched rows byte-identical") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      // remove doc 2 (900 toks straddling the full seq 0 AND the
      // partial tail seq 1): both rows rewrite — including the
      // tail-rebuild path — holes = exactly its token count, and the
      // survivors' tokens stay in place around them
      val got = IncrementalPack.padRewrite(
        spark, docsDf(Seq(doc(2, 1))).select("doc_id"), idx, docsDf(corpus))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          r.getInt(5), r.getString(6))).toSeq.sortBy(_._1)
      // plain-Scala replay with the PAD substitution
      val toks = corpus.sortBy(_._1).flatMap { case (id, t) =>
        t.split(" ").map(tok => (id, tok)) }
      val exp = toks.zipWithIndex.groupBy(_._2 / SeqLen).toSeq.sortBy(_._1)
        .map { case (seq, elems) =>
          val surv = elems.map(_._1._1).filter(_ != 2L)
          val padded = elems.map { case ((id, tok), _) =>
            if (id == 2L) IncrementalPack.PadTok else tok }
          (seq.toLong, elems.size, surv.distinct.size,
            if (surv.isEmpty) -1L else surv.min,
            if (surv.isEmpty) -1L else surv.max,
            elems.count(_._1._1 == 2L), md5hex(padded.mkString(" ")))
        }
      assert(got == exp, s"pad-rewrite drifted:\n got=$got\n exp=$exp")
      assert(got.map(_._6).sum == 900, "hole count != removed doc's tokens")
      assert(got.filter(_._6 > 0).map(_._1) == Seq(0L, 1L),
        "rewritten set != the straddled sequences")

      // a request hitting only seq 0 (doc 1) leaves the tail row
      // BYTE-identical to the artifact's stored tail
      val got1 = IncrementalPack.padRewrite(
        spark, docsDf(Seq(doc(1, 1))).select("doc_id"), idx, docsDf(corpus))
        .collect().map(r => (r.getLong(0), r.getInt(5), r.getString(6))).toSeq
      val storedTailHash = md5hex(
        spark.read.parquet(s"$idx/state").collect().head.getString(1))
      assert(got1.find(_._1 == 1L).map(t => (t._2, t._3))
        .contains((0, storedTailHash)),
        "untouched tail row drifted from the stored artifact")
      assert(got1.find(_._1 == 0L).exists(_._2 == 1200),
        "seq-0 rewrite lost doc 1's holes")
    }
  }

  test("q146 repack: frozen prefix is the stored artifact row, suffix equals the survivor repack") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      def run(removed: Long) = IncrementalPack.repackFrom(
        spark, docsDf(Seq(doc(removed, 1))).select("doc_id"), idx, docsDf(corpus))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5), r.getString(6))).toSeq
      def exp(removed: Long, firstHit: Long) =
        replay(corpus.filter(_._1 != removed)).map { case (s, nt, nd, fd, ld, _, h) =>
          (s, nt, nd, fd, ld, s >= firstHit, h) }
      // doc 3 starts at offset 2100 (seq 1): seq 0 frozen, the tail
      // rebuilt from doc 2's straddle suffix (52 tokens past the cut —
      // the token-granular trim under test)
      val got3 = run(3)
      assert(got3 == exp(3, 1L), s"repack(3) drifted:\n got=$got3\n exp=${exp(3, 1L)}")
      val stored0 = spark.read.parquet(s"$idx/seqs").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getLong(4), false, r.getString(5))).find(_._1 == 0L).get
      assert(got3.head == stored0, "frozen row differs from the stored artifact row")
      assert(got3.last == ((1L, 52, 1, 2L, 2L, true,
        md5hex((848 until 900).map(j => s"d2_$j").mkString(" ")))),
        "straddle-trimmed tail wrong")
      // doc 2 starts at offset 1200 (seq 0): cut = 0, nothing frozen —
      // the repack honestly pays for the whole stream
      val got2 = run(2)
      assert(got2 == exp(2, 0L), s"repack(2) drifted:\n got=$got2\n exp=${exp(2, 0L)}")
      assert(got2.forall(_._6), "cut at 0 must rebuild every row")
    }
  }

  test("q139 pricing is exactly what q145/q146 execute: direct_hit = padded rows, must_rewrite = rebuilt rows") {
    // the contract's two-plans-one-answer check: the audit PRICES from
    // roster arithmetic alone; both executions must touch exactly the
    // priced sets — nothing more (over-rewriting wastes the 100 TB
    // budget), nothing less (under-rewriting leaks the takedown)
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      for (removed <- Seq(2L, 3L)) {
        val ids = docsDf(Seq(doc(removed, 1))).select("doc_id")
        val price = IncrementalPack.priceTakedown(spark, ids, idx).collect()
          .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3)))
        val padded = IncrementalPack.padRewrite(spark, ids, idx, docsDf(corpus))
          .collect().map(r => r.getLong(0) -> (r.getInt(5) > 0)).toMap
        val rebuilt = IncrementalPack.repackFrom(spark, ids, idx, docsDf(corpus))
          .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
        val directHits = price.filter(_._2).map(_._1).toSet
        assert(padded.filter(_._2).keySet == directHits,
          s"removed=$removed: pad-rewrite touched ${padded.filter(_._2).keySet}, priced $directHits")
        assert(price.filter(_._3).map(_._1).toSet == rebuilt.filter(_._2).keySet,
          s"removed=$removed: repack rebuilt ${rebuilt.filter(_._2).keySet}, priced ${price.filter(_._3).map(_._1).toSet}")
        // same universe: every priced seq_id appears in both executions
        assert(padded.keySet == price.map(_._1).toSet && {
          // the repack CLOSES holes, so its seq universe may shrink —
          // but only past the cut, and never below the priced count of
          // surviving tokens' sequences
          rebuilt.keySet.subsetOf(price.map(_._1).toSet)
        }, s"removed=$removed: seq universes drifted")
      }
    }
  }

  test("q147 fold: the chain continues after a takedown — ingest onto gen1 equals the survivor repack") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      val survivors = corpus.filter(_._1 != 3L)
      val gen1 = IncrementalPack.applyTakedown(spark,
        docsDf(Seq(doc(3, 1))).select("doc_id"), idx, docsDf(corpus), s"$root/gen1")
      // the folded roster IS the from-scratch survivor roster
      val roster = spark.read.parquet(s"$gen1/docspans").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      val offs = survivors.sortBy(_._1)
        .scanLeft((0L, 0L, 0L)) { case ((_, off, n), (id, t)) =>
          (id, off + n, t.split(" ").length.toLong) }.tail
        .map { case (id, off, n) => (id, off, n) }
      assert(roster == offs, s"folded roster drifted:\n got=$roster\n exp=$offs")
      // serve of gen1 alone = the survivor repack; then the chain
      // continues exactly as if the pack had been built without doc 3
      assert(served(Seq.empty, gen1) == replay(survivors),
        "gen1 serve != from-scratch survivor pack")
      assert(served(day1, gen1) == replay(survivors ++ day1),
        "day-1 serve onto the folded generation drifted")
      val gen2 = IncrementalPack.ingest(spark, docsDf(day1), gen1, s"$root/gen2")
      assert(served(day2, gen2) == replay(survivors ++ day1 ++ day2),
        "day-2 serve after post-takedown ingest drifted")
      // a request that misses the pack folds to the identity
      val genId = IncrementalPack.applyTakedown(spark,
        docsDf(Seq(doc(999, 1))).select("doc_id"), idx, docsDf(corpus), s"$root/genid")
      assert(artifactContent(genId) == artifactContent(idx),
        "identity fold changed seqs/state")
      assert(spark.read.parquet(s"$genId/docspans").collect().toSet
        == spark.read.parquet(s"$idx/docspans").collect().toSet,
        "identity fold changed the roster")
    }
  }

  /** [[replay]] with the removed docs' tokens as `<PAD>` attributed to
    * no document — the from-scratch padded pack the pad fold must
    * serve. */
  private def replayPadded(rows: Seq[(Long, String)], removed: Set[Long]) = {
    val toks = rows.sortBy(_._1).flatMap { case (id, t) =>
      t.split(" ").map(tok =>
        if (removed(id)) (None: Option[Long], IncrementalPack.PadTok)
        else (Some(id), tok)) }
    toks.zipWithIndex.groupBy(_._2 / SeqLen).toSeq.sortBy(_._1).map { case (seq, elems) =>
      val ids = elems.flatMap(_._1._1)
      // an ALL-pad trailing sequence stores first/last = -1 (the
      // writeGeneration no-tail coalesce convention)
      (seq.toLong, elems.size, ids.distinct.size,
        if (ids.isEmpty) -1L else ids.min, if (ids.isEmpty) -1L else ids.max,
        1000000L * elems.size / SeqLen, md5hex(elems.map(_._1._2).mkString(" ")))
    }
  }

  test("q148 pad fold: the chain continues over frozen offsets — serve and ingest stitch onto the pads") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      val gen1 = IncrementalPack.applyPadTakedown(spark,
        docsDf(Seq(doc(3, 1))).select("doc_id"), idx, docsDf(corpus), s"$root/gen1")
      // the folded generation serves the padded pack (tail text padded)
      assert(served(Seq.empty, gen1) == replayPadded(corpus, Set(3L)),
        "gen1 serve != from-scratch padded pack")
      // the roster drops the removed doc, survivors keep frozen spans
      val roster = spark.read.parquet(s"$gen1/docspans").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      assert(roster == Seq((1L, 0L, 1200L), (2L, 1200L, 900L)),
        s"pad-fold roster drifted: $roster")
      // the next day stitches onto the padded tail at the FROZEN total
      assert(served(day1, gen1) == replayPadded(corpus ++ day1, Set(3L)),
        "day-1 serve onto the pad-folded generation drifted")
      val gen2 = IncrementalPack.ingest(spark, docsDf(day1), gen1, s"$root/gen2")
      assert(served(day2, gen2) == replayPadded(corpus ++ day1 ++ day2, Set(3L)),
        "day-2 serve after pad-fold ingest drifted")
      // a request that misses the pack folds to the identity
      val genId = IncrementalPack.applyPadTakedown(spark,
        docsDf(Seq(doc(999, 1))).select("doc_id"), idx, docsDf(corpus), s"$root/genid")
      assert(artifactContent(genId) == artifactContent(idx),
        "identity pad fold changed seqs/state")
      assert(spark.read.parquet(s"$genId/docspans").collect().toSet
        == spark.read.parquet(s"$idx/docspans").collect().toSet,
        "identity pad fold changed the roster")
    }
  }

  test("q149 gate: the decision numbers tie to q139's sets and the fixture's exact token arithmetic") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      def gate(removed: Long) = {
        val r = IncrementalPack.branchGate(spark,
          docsDf(Seq(doc(removed, 1))).select("doc_id"), idx).collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6))
      }
      def priced(removed: Long) = {
        val rows = IncrementalPack.priceTakedown(spark,
          docsDf(Seq(doc(removed, 1))).select("doc_id"), idx).collect()
        (rows.count(_.getBoolean(2)).toLong, rows.count(_.getBoolean(3)).toLong)
      }
      // doc 3 (start 2100, seq 1 only): pad re-explodes doc 2's 900
      // tokens to fill one sequence; repack reads just the 52-token
      // straddle suffix — the gate must pick repack
      val g3 = gate(3)
      assert(g3 == ((1L, 1L, 900L, 52L, 900L, 300000L, "repack")), s"gate(3)=$g3")
      assert((g3._1, g3._2) == priced(3), "gate(3) counts != q139 sets")
      // doc 2 (straddles seq 0/1): both branches touch 2100 survivor
      // tokens — the tie goes to pad (no hole in the artifact's seq ids)
      val g2 = gate(2)
      assert(g2 == ((2L, 2L, 2100L, 2100L, 900L, 300000L, "pad")), s"gate(2)=$g2")
      assert((g2._1, g2._2) == priced(2), "gate(2) counts != q139 sets")
    }
  }

  test("takedown folds at the edges: first doc, multiple docs, and the whole corpus") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      def ids(rm: Long*) = docsDf(rm.map(doc(_, 1))).select("doc_id")
      // removing the FIRST doc: cut = 0, nothing frozen, every survivor
      // shifts by the full removed mass
      val gFirst = IncrementalPack.applyTakedown(spark, ids(1), idx,
        docsDf(corpus), s"$root/gfirst")
      assert(served(Seq.empty, gFirst) == replay(corpus.filter(_._1 != 1L)),
        "remove-first repack fold drifted")
      val rFirst = spark.read.parquet(s"$gFirst/docspans").collect()
        .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
      assert(rFirst == Seq((2L, 0L), (3L, 900L)), s"remove-first roster: $rFirst")
      // removing TWO docs: the shift prefix sum must accumulate both
      // masses (doc 2 removed → doc 3 shifts by 900; doc 1 also removed
      // → doc 3 shifts by 2100 total)
      val gTwo = IncrementalPack.applyTakedown(spark, ids(1, 2), idx,
        docsDf(corpus), s"$root/gtwo")
      assert(served(Seq.empty, gTwo) == replay(corpus.filter(_._1 == 3L)),
        "two-doc repack fold drifted")
      assert(spark.read.parquet(s"$gTwo/docspans").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSeq == Seq((3L, 0L)),
        "two-doc roster shift wrong")
      // removing EVERYTHING: the generation must be validly EMPTY
      // (total 0, no tail) and the chain must restart cleanly on it
      val gAll = IncrementalPack.applyTakedown(spark, ids(1, 2, 3), idx,
        docsDf(corpus), s"$root/gall")
      assert(served(Seq.empty, gAll).isEmpty, "remove-all still serves rows")
      val gNext = IncrementalPack.ingest(spark, docsDf(day1), gAll, s"$root/gnext")
      assert(served(Seq.empty, gNext) == replay(day1),
        "ingest onto the emptied generation drifted")
      // pad fold with TWO removed docs: both hole spans pad, survivors
      // keep frozen offsets, and the chain stitches onto the pads
      val gPad = IncrementalPack.applyPadTakedown(spark, ids(1, 3), idx,
        docsDf(corpus), s"$root/gpad")
      assert(served(Seq.empty, gPad) == replayPadded(corpus, Set(1L, 3L)),
        "two-doc pad fold drifted")
      assert(served(day1, gPad) == replayPadded(corpus ++ day1, Set(1L, 3L)),
        "day-1 serve onto the two-doc pad fold drifted")
    }
  }

  test("fold composition: pads are roster state — a later repack consumes them, a later pad fold re-injects them") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      def ids(rm: Long*) = docsDf(rm.map(doc(_, 1))).select("doc_id")
      // pad(3) then pad(2): doc 2's rebuild touches seq 1, which
      // already holds doc 3's pads — they must re-inject from pads/
      // (they live in NO document's text); seq 1 ends all-pad
      val p3 = IncrementalPack.applyPadTakedown(spark, ids(3), idx,
        docsDf(corpus), s"$root/p3")
      val p32 = IncrementalPack.applyPadTakedown(spark, ids(2), p3,
        docsDf(corpus), s"$root/p32")
      assert(served(Seq.empty, p32) == replayPadded(corpus, Set(2L, 3L)),
        "pad∘pad lost the earlier fold's holes")
      // pad(3) then REPACK(2): cut 0 — the repack closes doc 2's hole
      // AND consumes doc 3's pads; the total must drop BOTH masses
      val r32 = IncrementalPack.applyTakedown(spark, ids(2), p3,
        docsDf(corpus), s"$root/r32")
      assert(served(Seq.empty, r32) == replay(Seq(doc(1, 1200))),
        "pad∘repack left holes in the rebuilt stream")
      assert(spark.read.parquet(s"$r32/state").collect()(0).getLong(0) == 1200L,
        "total still counts vanished pad positions")
      assert(served(day1, r32) == replay(Seq(doc(1, 1200)) ++ day1),
        "chain after pad∘repack drifted")
      // pad(1) then REPACK(3): the cut lands at seq 1 — doc 1's pads
      // sit entirely below it, stay frozen in seq 0's content, and
      // survive in pads/ (a later rebuild of seq 0 still needs them)
      val p1 = IncrementalPack.applyPadTakedown(spark, ids(1), idx,
        docsDf(corpus), s"$root/p1")
      val r13 = IncrementalPack.applyTakedown(spark, ids(3), p1,
        docsDf(corpus), s"$root/r13")
      assert(served(Seq.empty, r13) == replayPadded(corpus.filter(_._1 != 3L), Set(1L)),
        "below-cut pads did not survive the repack")
      assert(spark.read.parquet(s"$r13/pads").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1200L)),
        "pad roster not carried below the cut")
      assert(served(day1, r13) == replayPadded(corpus.filter(_._1 != 3L) ++ day1, Set(1L)),
        "chain after a below-cut-padded repack drifted")
    }
  }

  test("pads ride through ingest: a fold after an append still re-injects the old holes") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      val p3 = IncrementalPack.applyPadTakedown(spark,
        docsDf(Seq(doc(3, 1))).select("doc_id"), idx, docsDf(corpus), s"$root/p3")
      val g1 = IncrementalPack.ingest(spark, docsDf(day1), p3, s"$root/g1")
      // doc 2's request hits seq 1, which holds doc 3's pre-append
      // pads — the hole roster must have survived the ingest for the
      // rebuild to re-inject them
      val g2 = IncrementalPack.applyPadTakedown(spark,
        docsDf(Seq(doc(2, 1))).select("doc_id"), g1,
        docsDf(corpus ++ day1), s"$root/g2")
      assert(served(Seq.empty, g2) == replayPadded(corpus ++ day1, Set(2L, 3L)),
        "post-ingest fold lost the pre-append holes")
      // and the repack branch consumes BOTH eras' holes the same way
      val r2 = IncrementalPack.applyTakedown(spark,
        docsDf(Seq(doc(2, 1))).select("doc_id"), g1,
        docsDf(corpus ++ day1), s"$root/r2")
      assert(served(Seq.empty, r2) == replay(Seq(doc(1, 1200)) ++ day1),
        "post-ingest repack left holes")
    }
  }

  test("a removal request naming a doc twice behaves exactly as the distinct request") {
    // removal requests are EXTERNAL legal input — nothing upstream
    // guarantees distinct ids. Before normalization, a repeated id
    // duplicated its tomb rows: applyTakedown double-counted the removed
    // mass (total folded too small, later ingests appended at the wrong
    // offset) and the pad rewrite emitted duplicate <PAD> tokens at the
    // same positions (inflated n_tokens/n_pad, corrupt content hashes).
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      import spark.implicits._
      val dup = Seq(2L, 2L, 3L, 2L).toDF("doc_id")
      val one = Seq(2L, 3L).toDF("doc_id")
      def rows(df: DataFrame) = df.collect().map(_.toSeq).toSeq
      assert(rows(IncrementalPack.priceTakedown(spark, dup, idx)) ==
             rows(IncrementalPack.priceTakedown(spark, one, idx)),
        "pricing counts a doc per mention, not per identity")
      assert(rows(IncrementalPack.branchGate(spark, dup, idx)) ==
             rows(IncrementalPack.branchGate(spark, one, idx)),
        "branch gate double-prices a repeated id")
      assert(rows(IncrementalPack.padRewrite(spark, dup, idx, docsDf(corpus))) ==
             rows(IncrementalPack.padRewrite(spark, one, idx, docsDf(corpus))),
        "pad rewrite double-injects <PAD> for a repeated id")
      assert(rows(IncrementalPack.repackFrom(spark, dup, idx, docsDf(corpus))) ==
             rows(IncrementalPack.repackFrom(spark, one, idx, docsDf(corpus))),
        "repack drifts under a repeated id")
      // the folds: the duplicated request must produce the SAME generation
      val gDup = IncrementalPack.applyTakedown(spark, dup, idx,
        docsDf(corpus), s"$root/gdup")
      assert(served(Seq.empty, gDup) == replay(Seq(doc(1, 1200))),
        "repack fold drifted under a duplicated request")
      assert(spark.read.parquet(s"$gDup/state").collect()(0).getLong(0) == 1200L,
        "removed mass double-counted: folded total is wrong")
      // ...and the chain continues at the RIGHT offset
      val gNext = IncrementalPack.ingest(spark, docsDf(day1), gDup, s"$root/gnext")
      assert(served(Seq.empty, gNext) == replay(Seq(doc(1, 1200)) ++ day1),
        "ingest after a duplicated-request fold appended at the wrong offset")
      val pDup = IncrementalPack.applyPadTakedown(spark, dup, idx,
        docsDf(corpus), s"$root/pdup")
      assert(served(Seq.empty, pDup) == replayPadded(corpus, Set(2L, 3L)),
        "pad fold drifted under a duplicated request")
    }
  }

  test("multi-day chain stays equal to the full repack") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      val g1 = IncrementalPack.ingest(spark, docsDf(day1), idx, s"$root/gen1")
      val got = served(day2, g1)
      assert(got == replay(corpus ++ day1 ++ day2),
        "day-2 serve against gen1 differs from the three-way repack")
      // and ingesting day 2 equals building the union from scratch
      val g2 = IncrementalPack.ingest(spark, docsDf(day2), g1, s"$root/gen2")
      val scratch = IncrementalPack.buildPackState(
        spark, docsDf(corpus ++ day1 ++ day2), s"$root/scratch")
      assert(artifactContent(g2) == artifactContent(scratch),
        "two-day incremental chain diverged from the from-scratch artifact")
    }
  }

  test("q151 attribution maps every position to the replayed (seq, doc, offset, token)") {
    withTempRoot { root =>
      val idx = IncrementalPack.buildPackState(spark, docsDf(corpus), s"$root/gen0")
      import spark.implicits._
      // positions exercising both doc boundaries (1199→1200, 2099→2100)
      // and the sequence boundary (2047→2048), plus first and last token
      val ps = Seq(0L, 13L, 1199L, 1200L, 2047L, 2048L, 2099L, 2100L, 2999L)
      val got = IncrementalPack.attribute(spark, ps.toDF("p"), idx, docsDf(corpus))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSeq
      // plain-Scala replay: flatten docs in id order, index directly
      val flat = corpus.sortBy(_._1).flatMap { case (id, t) =>
        t.split(" ").zipWithIndex.map { case (tok, j) => (id, j.toLong, tok) }
      }
      val want = ps.map { p =>
        val (id, off, tok) = flat(p.toInt)
        (p, p / SeqLen, id, off, tok)
      }
      assert(got == want, s"attribution mismatch:\n got=$got\nwant=$want")
      // the fixture tokens are "d<id>_<j>", so a correct row is
      // self-certifying: the token NAMES its doc and offset
      got.foreach { case (_, _, id, off, tok) =>
        assert(tok == s"d${id}_$off", s"token does not certify its source: $tok vs d${id}_$off")
      }
    }
  }
}
