package graft

import java.security.MessageDigest

/** Driver-side recomputation of the round-6 text operators — the Gopher
  * rule battery (q65), span-level exact dedup (q66), and unigram
  * surprisal (q67) — against the raw `documents` table, independent of
  * both the Spark plans and the DuckDB oracle.
  */
class TextQualitySpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docs =
    Tables.documents(spark, sfDir).select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)

  test("q65 quality rules match a per-document Scala recomputation") {
    val got = SparkEntry.queries("q65_quality_rules")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getInt(8), r.getBoolean(9))))
      .toMap
    docs.foreach { case (id, text, nChars) =>
      val ts = text.split(" ", -1)
      val ls = text.split("\n", -1)
      val nWords = ts.length
      val meanWlen = round6((nChars - (nWords - 1)).toDouble / nWords)
      val nSym = "#|\\.\\.\\.".r.findAllIn(text).length
      val symbolRatio = round6(nSym.toDouble / nWords)
      val bulletFrac = round6(ls.count(l => l.startsWith("- ") || l.startsWith("* ")).toDouble / ls.length)
      val ellipsisFrac = round6(ls.count(_.endsWith("...")).toDouble / ls.length)
      val alphaFrac = round6(ts.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toDouble / nWords)
      val nStop = ts.count(Set("the", "a", "is"))
      val mask =
        (if (nWords < 50 || nWords > 100000) 1 else 0) +
        (if (meanWlen < 3.0 || meanWlen > 10.0) 2 else 0) +
        (if (symbolRatio > 0.1) 4 else 0) +
        (if (bulletFrac > 0.9) 8 else 0) +
        (if (ellipsisFrac > 0.3) 16 else 0) +
        (if (alphaFrac < 0.8) 32 else 0) +
        (if (nStop < 2) 64 else 0)
      assert(got(id) == ((nWords, meanWlen, mask, mask == 0)),
        s"doc $id: got=${got(id)} expect=${(nWords, meanWlen, mask, mask == 0)}")
    }
    // the battery must actually discriminate on this corpus
    val kept = got.values.count(_._4)
    assert(kept > 0 && kept < got.size, s"degenerate rule battery: $kept/${got.size} kept")
  }

  test("q66 span dedup matches a global first-occurrence sweep") {
    val got = SparkEntry.queries("q66_span_dedup")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    val seen = scala.collection.mutable.Set[String]()
    docs.foreach { case (id, text, _) =>
      val ts = text.split(" ", -1)
      val segs = ts.grouped(8).map(_.mkString(" ")).toSeq
      val keptSegs = segs.filter(seen.add) // add returns false on duplicates
      val expect = (segs.size, keptSegs.size, md5hex(keptSegs.mkString(" ")))
      assert(got(id) == expect, s"doc $id: got=${got(id)} expect=$expect")
    }
    // duplicates must exist corpus-wide (the planted re-ingests guarantee it)
    assert(got.values.exists(v => v._2 < v._1), "no duplicate spans found — operator untested")
  }

  test("q103 dup-span profile matches a sequential sliding-window sweep") {
    val W = 8
    val got = SparkEntry.queries("q103_dupspan_profile")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getInt(6), r.getInt(7)))).toMap
    // one ordered pass in (doc_id, pos) order — the operator's first-
    // occurrence semantics recomputed sequentially, spans merged by hand
    val seen = scala.collection.mutable.Set[String]()
    docs.foreach { case (id, text, _) =>
      val ts = text.split(" ", -1)
      val n = ts.length
      val nWins = math.max(n - W + 1, 0)
      val dupStarts = (0 until nWins).filter { p =>
        !seen.add(ts.slice(p, p + W).mkString(" "))
      }
      val covered = dupStarts.flatMap(p => p until (p + W)).distinct.sorted
      val spans = covered.foldLeft(List.empty[(Int, Int)]) { // (start, len), reversed
        case ((s0, l0) :: rest, x) if x == s0 + l0 => (s0, l0 + 1) :: rest
        case (acc, x)                              => (x, 1) :: acc
      }
      val expect = (n, nWins, dupStarts.size, covered.size,
        covered.size.toLong * 1000000L / n, spans.size,
        if (spans.isEmpty) 0 else spans.map(_._2).max)
      assert(got(id) == expect, s"doc $id: got=${got(id)} expect=$expect")
    }
    // the profiler must actually find offset duplication on this corpus,
    // and some of it must be MERGED spans (adjacent windows overlapping)
    assert(got.values.exists(_._4 > 0), "no duplicate coverage found — operator untested")
    assert(got.values.exists(v => v._7 > W), "no merged span longer than one window")
  }

  test("q150 strips q103's profiled spans at token granularity, md5-verified bytes") {
    val W = 8
    val got = SparkEntry.queries("q150_dupspan_strip")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    // the same global first-occurrence sweep as q103's, then the strip:
    // remove every covered position, reassemble the survivors in order
    val seen = scala.collection.mutable.Set[String]()
    docs.foreach { case (id, text, _) =>
      val ts = text.split(" ", -1)
      val n = ts.length
      val nWins = math.max(n - W + 1, 0)
      val dupStarts = (0 until nWins).filter { p =>
        !seen.add(ts.slice(p, p + W).mkString(" "))
      }
      val covered = dupStarts.flatMap(p => p until (p + W)).toSet
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      val expect = (n, covered.size, n - covered.size, md5hex(kept.mkString(" ")))
      assert(got(id) == expect, s"doc $id: got=${got(id)} expect=$expect")
    }
    // the strip must actually remove something on this corpus (the
    // planted re-ingests guarantee offset duplication exists)
    assert(got.values.exists(_._2 > 0), "nothing stripped — operator untested")
    assert(got.values.exists(_._2 == 0), "everything stripped — fixture degenerate")
  }

  test("q150 removal mass equals q103's profiled coverage per document") {
    // the detect/execute contract: the strip removes EXACTLY the
    // positions the profiler reported (dup_pos), document by document
    val profile = SparkEntry.queries("q103_dupspan_profile")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    val strip = SparkEntry.queries("q150_dupspan_strip")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(profile.keySet == strip.keySet)
    profile.foreach { case (id, dupPos) =>
      assert(strip(id) == dupPos, s"doc $id: stripped ${strip(id)} != profiled $dupPos")
    }
  }

  test("q103 sees offset-shifted duplication that block-aligned q66 misses") {
    // a copied passage shifted by 1 token: q66's boundary-aligned segments
    // hash differently, q103's stride-1 windows still match
    val passage = (1 to 24).map(i => s"tok$i").mkString(" ")
    val a = s"$passage alpha beta gamma delta"
    val b = s"shift $passage epsilon zeta eta theta"
    val seen = scala.collection.mutable.Set[String]()
    val expect = Seq((1L, a), (2L, b)).map { case (id, text) =>
      val ts = text.split(" ", -1); val n = ts.length
      val dup = (0 to n - 8).count(p => !seen.add(ts.slice(p, p + 8).mkString(" ")))
      id -> dup
    }.toMap
    assert(expect(2L) == 24 - 8 + 1, "fixture: the shifted passage must be fully re-seen")
    // q66 on the same fixture finds zero duplicate segments (offset 1 ≠ 0 mod 8)
    val segs = Seq((1L, a), (2L, b)).flatMap { case (id, t) =>
      t.split(" ", -1).grouped(8).map(g => (id, g.mkString(" ")))
    }
    val segSeen = scala.collection.mutable.Set[String]()
    val q66Dups = segs.count { case (_, s) => !segSeen.add(s) }
    assert(q66Dups == 0, "fixture defeated: block alignment accidentally matched")
  }

  test("q69 vocabulary coverage reaches exactly 1.0 and counts every corpus token") {
    val rows = SparkEntry.queries("q69_vocab_coverage")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
      .sortBy(_._1)
    val nTokens = docs.map(_._2.split(" ", -1).length.toLong).sum
    assert(rows.last._4 == nTokens, s"cum_freq ${rows.last._4} != corpus tokens $nTokens")
    assert(rows.last._5 == 1.0)
    // ranks contiguous, frequencies non-increasing, vocab flag at the cap
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true })
    rows.foreach { case (rank, _, _, _, _, inV) => assert(inV == (rank <= 16)) }
  }

  test("q69 two-phase prefix sum equals the single-window global rank/cumsum") {
    // the r9 rewrite: bucketed rank/cumsum + bucket offsets must be
    // row-identical to the plain global window it replaced — recomputed
    // here exactly (one ordered Scala pass, the single-window semantics)
    val got = SparkEntry.queries("q69_vocab_coverage")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
      .sortBy(_._1)
    val freq = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { case (_, text, _) => text.split(" ", -1).foreach(t => freq(t) += 1) }
    val total = freq.values.sum
    var cum = 0L
    val expect = freq.toSeq.sortBy { case (t, f) => (-f, t) }.zipWithIndex.map {
      case ((t, f), i) =>
        cum += f
        (i + 1, t, f, cum, round6(cum.toDouble / total), i + 1 <= 16)
    }
    assert(got.toSeq == expect,
      s"got=${got.toSeq.take(5)}…\nexpect=${expect.take(5)}…")
  }

  test("q70 BPE merge candidates match a per-word pair-count recomputation") {
    val got = SparkEntry.queries("q70_bpe_merges")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { case (_, text, _) =>
      text.split(" ", -1).filter(_.length >= 2).foreach { w =>
        (0 until w.length - 1).foreach(i => counts(w.substring(i, i + 2)) += 1)
      }
    }
    val expect = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
      .zipWithIndex.map { case ((p, c), i) => (i + 1, p, c) }
    assert(got.toSeq == expect, s"got=${got.toSeq.take(5)}…\nexpect=${expect.take(5)}…")
  }

  test("q72's narrow repetition column matches q55's aggregation verdict on every doc") {
    import graft.queries.TextPipeline
    val agg = SparkEntry.queries("q55_repetition")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap // doc_id -> keep
    val narrow = TextPipeline.withRepetitionFail(
        TextPipeline.withQualityRules(Tables.documentsWide(spark, sfDir)))
      .select("doc_id", "rep_fail").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
    assert(narrow.nonEmpty)
    narrow.foreach { case (id, rf) =>
      // q55 emits rows only for docs with >= 2 tokens; shorter docs must
      // not fail the repetition stage in either formulation
      assert(rf == agg.get(id).map(!_).getOrElse(false),
        s"doc $id: narrow rep_fail=$rf, q55 keep=${agg.get(id)}")
    }
  }

  test("q67 surprisal matches an integer-log2 Scala recomputation") {
    val got = SparkEntry.queries("q67_surprisal")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val allToks = docs.flatMap { case (_, text, _) => text.split(" ", -1) }
    val freq = allToks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = allToks.length.toLong
    def ilog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    docs.foreach { case (id, text, _) =>
      val ts = text.split(" ", -1)
      val bits = ts.map(t => ilog2(total / freq(t))).sum
      val milli = bits * 1000 / ts.length
      val expect = (ts.length.toLong, bits, milli, milli >= 1000 && milli <= 9000)
      assert(got(id) == expect, s"doc $id: got=${got(id)} expect=$expect")
    }
  }

  test("q80 CMS estimates never undercount and match a plain-Scala sketch replay") {
    val rows = SparkEntry.queries("q80_cms_heavyhitters")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.head._1 == 1)
    // CMS guarantee: min-of-cells is an upper bound on the true count
    rows.foreach { case (rk, tok, freq, est, over) =>
      assert(est >= freq, s"rank $rk '$tok': est $est undercounts freq $freq")
      assert(over == est - freq)
    }
    // independent replay: build the 4×512 sketch in plain Scala over the
    // same tokens with the same md5 cell addressing
    val toks = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    def cell(r: Int, tok: String): Int = {
      // row r reads its own disjoint 12-bit slice of ONE digest
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h.substring(r * 3, r * 3 + 3), 16) % 512).toInt
    }
    val sketch = Array.fill(4, 512)(0L)
    toks.foreach(t => (0 until 4).foreach(r => sketch(r)(cell(r, t)) += 1))
    val freq = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    rows.foreach { case (rk, tok, f, est, _) =>
      assert(freq(tok) == f, s"'$tok' exact count mismatch")
      val replay = (0 until 4).map(r => sketch(r)(cell(r, tok))).min
      assert(replay == est, s"rank $rk '$tok': replayed est $replay != $est")
    }
    // the heaviest true token must surface at rank 1 (est ranking can
    // only promote by collisions, never demote the maximum)
    val maxTok = freq.maxBy { case (t, f) => (f, t) }
    assert(rows.head._4 >= maxTok._2, "rank-1 estimate below the true maximum")
  }

  test("q114 source health report aggregates exactly q65's per-doc battery") {
    val srcOf = Tables.documents(spark, sfDir).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val masks = SparkEntry.queries("q65_quality_rules")(spark, sfDir).collect()
      .map(r => srcOf(r.getLong(0)) -> r.getInt(8))
    val got = SparkEntry.queries("q114_source_health")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        (3 to 9).map(r.getLong).toVector))).toMap
    masks.groupBy(_._1).foreach { case (src, v) =>
      val ms = v.map(_._2)
      val n = ms.length.toLong
      val keep = 1000000L * ms.count(_ == 0) / n
      val bits = Vector(1, 2, 4, 8, 16, 32, 64)
        .map(b => 1000000L * ms.count(m => (m / b) % 2 == 1) / n)
      assert(got(src) == ((n, keep, bits)),
        s"source $src: got=${got(src)} expect=($n,$keep,$bits)")
    }
    // the report must show real differentiation somewhere (not all-keep)
    assert(got.values.exists(_._2 < 1000000L), "no source with any rule failure")
  }

  test("q116 vocabulary profile matches a plain frequency-spectrum replay") {
    val toks = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val freq = toks.groupBy(identity).map(_._2.length.toLong)
    val nTypes = freq.size.toLong
    val nOcc = toks.length.toLong
    val byBucket = freq.groupBy(f => (63 - java.lang.Long.numberOfLeadingZeros(f)).toInt)
    val got = SparkEntry.queries("q116_vocab_profile")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.keySet == byBucket.keySet, s"bucket sets: ${got.keySet} vs ${byBucket.keySet}")
    byBucket.foreach { case (b, fs) =>
      val expect = (fs.size.toLong, fs.sum,
        1000000L * fs.size / nTypes, 1000000L * fs.sum / nOcc)
      assert(got(b) == expect, s"bucket $b: got=${got(b)} expect=$expect")
    }
    // conservation + a non-degenerate spectrum (the synthetic corpus has
    // a closed ~31-type vocabulary, so no hapax bucket exists here — the
    // profile correctly REPORTS that, which is the signal's point)
    assert(got.values.map(_._1).sum == nTypes && got.values.map(_._2).sum == nOcc)
    assert(got.size >= 2, "degenerate one-bucket spectrum")
  }

  test("q123 release gate replays its criteria and fails on a degenerate corpus") {
    val got = SparkEntry.queries("q123_release_gate")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toLong
    val dups = docs.groupBy(_._2).values.map(_.size - 1).sum.toLong
    val toks = docs.map(_._2.split(" ", -1).length.toLong)
    val keeps = SparkEntry.queries("q65_quality_rules")(spark, sfDir).collect()
      .count(_.getInt(8) == 0).toLong
    val shorts = toks.count(_ < 16).toLong
    assert(got("exact_dup_ppm") ==
      ((1000000L * dups / n, 50000L, 1000000L * dups / n <= 50000L)))
    assert(got("quality_keep_ppm") ==
      ((1000000L * keeps / n, 500000L, 1000000L * keeps / n >= 500000L)))
    assert(got("short_doc_ppm") ==
      ((1000000L * shorts / n, 100000L, 1000000L * shorts / n <= 100000L)))
    assert(got("mean_doc_tokens_milli") ==
      ((1000L * toks.sum / n, 24000L, 1000L * toks.sum / n >= 24000L)))
    // the gate must be able to FAIL: a dup-heavy two-token corpus trips
    // every criterion
    val dir = java.nio.file.Files.createTempDirectory("graft_gate").toFile.getAbsolutePath
    import spark.implicits._
    Seq((0L, "a b", "en", "s0"), (1L, "a b", "en", "s0"), (2L, "c d", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bad = SparkEntry.queries("q123_release_gate")(spark, dir).collect()
    assert(bad.length == 4 && bad.forall(!_.getBoolean(3)),
      "degenerate corpus must fail every criterion")
  }

  test("q107 calibration curve equals plain-Scala replays of BOTH capped detectors") {
    val sh = SparkEntry.queries("q34_simhash")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // replay a banding with the production bucket cap (64): a bucket
    // over cap drops whole, in-bucket pairs dedup across bands
    def pairsOf(nBands: Int, bandBits: Int, hamMax: Int) = sh.flatMap { case (id, h) =>
      (0 until nBands).map(b =>
        ((b, h.substring(b * bandBits, b * bandBits + bandBits))) -> ((id, h))) }
      .groupBy(_._1).values
      .map(_.map(_._2).sortBy(_._1))
      .filter(v => v.size >= 2 && v.size <= 64)
      .flatMap(mem => for { i <- mem.indices; j <- (i + 1) until mem.size }
        yield (mem(i)._1, mem(j)._1, mem(i)._2, mem(j)._2))
      .toSet[(Long, Long, String, String)]
      .map { case (a, b, ha, hb) =>
        (a, b, ha.zip(hb).count { case (x, y) => x != y }) }
      .filter(_._3 <= hamMax)
    val got = SparkEntry.queries("q107_threshold_curve")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1).toInt) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    Seq(("4x8", 4, 8, 3), ("2x16", 2, 16, 1)).foreach {
      case (config, nBands, bandBits, hamMax) =>
        val pairs = pairsOf(nBands, bandBits, hamMax)
        val dmin = pairs.groupBy(_._2).map { case (d, v) => d -> v.map(_._3).min }
        (0 to hamMax).foreach { t =>
          val nP = pairs.count(_._3 <= t).toLong
          val nD = dmin.count(_._2 <= t).toLong
          val expect = (nP, nD, 1000000L * nD / sh.length)
          assert(got((config, t)) == expect,
            s"$config t=$t: got=${got((config, t))} expect=$expect")
        }
        // each config's curve is cumulative by construction
        assert((1 to hamMax).forall(t => got((config, t))._1 >= got((config, t - 1))._1 &&
          got((config, t))._2 >= got((config, t - 1))._2))
    }
    // the production arm is the DEPLOYED detector: its widest point
    // counts exactly q35's registered pair set
    val q35n = SparkEntry.queries("q35_simhash_pairs")(spark, sfDir).count()
    assert(got(("2x16", 1))._1 == q35n,
      s"production point ${got(("2x16", 1))._1} != q35 pair count $q35n")
  }

  test("q108 fertility report equals per-lang recomputation with the q30 tokenizers") {
    val got = SparkEntry.queries("q108_tokenizer_fertility")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val re = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
    val docs = Tables.documents(spark, sfDir).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (lang, v) =>
      val ws = v.map(_._2.split(" ", -1).length.toLong).sum
      val bpe = v.map(d => re.findAllIn(d._2).size.toLong).sum
      val nc = v.map(_._2.length.toLong).sum
      val expect = (v.size.toLong, ws, bpe, nc, 1000L * bpe / ws, 1000L * nc / bpe)
      assert(got(lang) == expect, s"lang $lang: got=${got(lang)} expect=$expect")
    }
    // subword fertility is ≥ 1 token per word by construction (each
    // whitespace word yields at least one regex token)
    assert(got.values.forall(_._5 >= 1000L))
  }

  test("q161 strips exactly the eval-overlapping spans; train-train duplication is untouched") {
    val evalWin = "e1 e2 e3 e4 e5 e6 e7 e8"
    val dir = langFixture(Seq(
      // eval slice (5 % 17 == 5) — the reference, never modified
      (5L, s"$evalWin tail1 tail2", "en", "s"),
      // full eval window mid-doc → its 8 positions excised
      (0L, s"a1 a2 $evalWin b1 b2", "en", "s"),
      // 7-token prefix of the window only → NOT contamination
      (1L, "e1 e2 e3 e4 e5 e6 e7 x1 x2", "en", "s"),
      // the window twice back-to-back → the whole doc is covered
      (2L, s"$evalWin $evalWin", "en", "s"),
      // shorter than one window → cannot match, passes intact
      (3L, "e1 e2", "en", "s"),
      // an 8-gram shared by two TRAIN docs: q150 would strip the second
      // copy; q161 must NOT (duplication is not contamination)
      (6L, "c1 c2 c3 c4 c5 c6 c7 c8 z1", "en", "s"),
      (7L, "c1 c2 c3 c4 c5 c6 c7 c8 z2", "en", "s")))
    val got = SparkEntry.queries("q161_decontam_strip")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getString(4))).toSeq
    val want = Seq(
      (0L, 12, 8, 4, md5hex("a1 a2 b1 b2")),
      (1L, 9, 0, 9, md5hex("e1 e2 e3 e4 e5 e6 e7 x1 x2")),
      (2L, 16, 16, 0, md5hex("")),
      (3L, 2, 0, 2, md5hex("e1 e2")),
      (6L, 9, 0, 9, md5hex("c1 c2 c3 c4 c5 c6 c7 c8 z1")),
      (7L, 9, 0, 9, md5hex("c1 c2 c3 c4 c5 c6 c7 c8 z2")))
    assert(got == want, s"decontam strip mismatch:\n got=$got\nwant=$want")
    assert(!got.exists(_._1 == 5L), "the eval doc leaked into the train output")
  }

  /** Write a (doc_id, text, lang, source) documents fixture dir — the
    * testdata's degenerate shared vocabulary cannot produce OOV or
    * per-language model divergence, so q152/q153 pin their semantics
    * on hand-built corpora. */
  private def langFixture(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    val dir = java.nio.file.Files.createTempDirectory("graft_tq").toFile
    dir.deleteOnExit()
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    dir.getAbsolutePath
  }

  test("q152 OOV drift: planted novel types are counted per language, seen types are not") {
    val dir = langFixture(Seq(
      // frozen generation (doc_id % 5 <> 4): vocabulary {a, b, c}
      (0L, "a b a c", "en", "s"),
      (1L, "b c b", "de", "s"),
      (2L, "a a", "en", "s"),
      // intake shard (doc_id % 5 = 4)
      (4L, "a x x y", "en", "s"),   // 3 OOV tokens, 2 new types, x twice
      (9L, "b b z", "de", "s")))    // 1 OOV token, 1 new type
    val got = SparkEntry.queries("q152_oov_drift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val want = Seq(
      ("de", 3L, 1L, 333333L, 2L, 1L, 1L),
      ("en", 4L, 3L, 750000L, 3L, 2L, 2L))
    assert(got == want, s"drift mismatch:\n got=$got\nwant=$want")
  }

  test("q153 tertile buckets: value-ordered bands per language, no-reference fallback") {
    // en reference (src0): eight 'a' tokens → bits(a)=0, oov cost
    // ⌊log₂ 8⌋+1 = 4 bits/token. Nine scored docs with k = 0..8 OOV
    // tokens out of 8 → millibits = 500k, plus the reference doc
    // itself at 0: n = 10, k(33) = 3, k(67) = 7 → cuts at 500, 2500.
    val ref = (100L, (1 to 8).map(_ => "a").mkString(" "), "en", "src0")
    val scored = (0 until 9).map { k =>
      val toks = (0 until k).map(j => s"x${k}_$j") ++ (k until 8).map(_ => "a")
      (k.toLong, toks.mkString(" "), "en", "srcX")
    }
    // one 'de' doc with NO de reference slice: every token costs the
    // flat 20 bits fallback → millibits 20000, a 1-doc language whose
    // single value is its own cut → bucket 'head'
    val de = (50L, "u v w x", "de", "srcX")
    val got = SparkEntry.queries("q153_ppl_buckets")(spark,
        langFixture(scored :+ ref :+ de))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val want = Seq(
      ("de", "head", 1L, 4L, 20000L, 20000L),
      ("en", "head", 3L, 24L, 0L, 500L),      // millibits 0 (×2), 500
      ("en", "middle", 4L, 32L, 1000L, 2500L),
      ("en", "tail", 3L, 24L, 3000L, 4000L))
    assert(got == want, s"bucket mismatch:\n got=$got\nwant=$want")
  }
}
