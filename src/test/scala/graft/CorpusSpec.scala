package graft

import org.apache.spark.sql.functions._

/** Specs for the corpus-preparation module (q90–q93): hand-checkable
  * synthetic fixtures for the policy branches the uniform testdata
  * cannot reach (per-source scoping, OOV gibberish, template collapse),
  * plus plain-Scala replays against the real testdata.
  */
class CorpusSpec extends SparkTestBase {

  /** Write a documents.parquet fixture and return its directory. */
  private def docsFixture(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus").toFile
    dir.deleteOnExit()
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    dir.getAbsolutePath
  }

  test("q90 strips a repeated segment only within its source, all copies") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8" // one exact 8-word segment
    val dir = docsFixture(Seq(
      (0L, s"$boiler u1 u2 u3 u4 u5 u6 u7 u8", "srcA"),  // boiler df=2 in srcA
      (1L, s"$boiler v1 v2 v3 v4 v5 v6 v7 v8", "srcA"),  // -> stripped from BOTH
      (2L, s"$boiler w1 w2 w3 w4 w5 w6 w7 w8", "srcB"))) // df=1 in srcB -> kept
    val got = SparkEntry.queries("q90_boilerplate_strip")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(0L) == ((2, 1)), "doc 0 must lose the shared segment")
    assert(got(1L) == ((2, 1)), "doc 1 must lose the shared segment too (no first-keeper)")
    assert(got(2L) == ((2, 2)), "same segment in another source is NOT boilerplate")
    // clean_hash is the md5 of the reassembled kept text
    val h = SparkEntry.queries("q90_boilerplate_strip")(spark, dir)
      .filter(col("doc_id") === 0).select("clean_hash").head().getString(0)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("u1 u2 u3 u4 u5 u6 u7 u8".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h == expect, "clean_hash must hash exactly the surviving segments")
  }

  test("q90 agrees with a per-doc replay on a seeded collision-heavy corpus") {
    // 60 docs / 3 sources, segments drawn from a pool of 12 so the
    // (source, segment) df spectrum covers 1..~15 — the policy's whole
    // decision range, not just the testdata's df ∈ {1, 2}.
    val rnd = new scala.util.Random(42)
    val pool = (0 until 12).map(p => (0 until 8).map(w => s"p${p}w$w").mkString(" "))
    val rows = (0 until 60).map { i =>
      val nSegs = 1 + rnd.nextInt(4)
      val text = (0 until nSegs).map(_ => pool(rnd.nextInt(pool.length))).mkString(" ")
      (i.toLong, text, s"src${i % 3}")
    }
    val dir = docsFixture(rows)
    val got = SparkEntry.queries("q90_boilerplate_strip")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // replay: df per (source, segment) over DISTINCT docs; kept iff df < 2
    val segsOf = rows.map { case (id, text, src) =>
      (id, src, text.split(" ").grouped(8).map(_.mkString(" ")).toSeq)
    }
    val df = segsOf.flatMap { case (id, src, segs) => segs.distinct.map(s => (src, s, id)) }
      .groupBy { case (src, s, _) => (src, s) }
      .map { case (k, v) => k -> v.map(_._3).distinct.size }
    segsOf.foreach { case (id, src, segs) =>
      val kept = segs.count(s => df((src, s)) < 2)
      assert(got(id) == ((segs.length, kept)),
        s"doc $id: got ${got(id)}, expect (${segs.length}, $kept)")
    }
    // the spectrum must actually exercise both policy branches heavily
    assert(df.values.exists(_ >= 3) && df.values.exists(_ == 1),
      "seeded corpus lost its df spread — regenerate")
  }

  test("q91 matches a plain-Scala BM25 replay on the testdata") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).filter(_.nonEmpty))
    val nDocs = docs.length.toLong
    val nToks = docs.map(_._2.length.toLong).sum
    val queries = Seq(
      1 -> "spark table join", 2 -> "window agg stream", 3 -> "dup merge scan",
      4 -> "customer order line", 5 -> "key value sort big")
    val expect = queries.flatMap { case (qid, qtext) =>
      val terms = qtext.split(" ").toSeq
      val dfOf = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
      docs.flatMap { case (id, ts) =>
        val hits = terms.filter(t => ts.contains(t))
        if (hits.isEmpty) None else {
          val dl = ts.length.toLong
          val score = hits.map { t =>
            val tf = ts.count(_ == t).toLong
            val idf = math.log(1.0 + (nDocs - dfOf(t) + 0.5) / (dfOf(t) + 0.5))
            val w = (tf * 22 * nToks).toDouble /
              (10.0 * nToks * tf + 3.0 * nToks + 9.0 * dl * nDocs)
            idf * w
          }.sum
          Some((qid, id, score, hits.length))
        }
      }.sortBy { case (_, id, sc, _) => (-sc, id) }.take(5).zipWithIndex
        .map { case ((q, id, sc, nh), i) =>
          (q, i + 1, id, math.rint(sc * 10000) / 10000, nh) }
    }.toSet
    val got = SparkEntry.queries("q91_bm25_topk")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
      .toSet
    assert(got == expect, s"BM25 top-5 mismatch:\n got=$got\n exp=$expect")
  }

  test("q92 positions replay the md5 permutation and tile each shard 1..n") {
    val got = SparkEntry.queries("q92_corpus_shard")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def key(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shard:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(15), 16)
    }
    val expect = got.map(_._1).sorted.map(id => (id, key(id))).toSeq
      .groupBy { case (_, k) => (k % 16).toInt }.toSeq
      .flatMap { case (shard, ids) =>
        ids.sortBy { case (id, k) => (k, id) }.zipWithIndex
          .map { case ((id, _), i) => (id, shard, (i + 1).toLong) }
      }.toSet
    assert(got.toSet == expect, "shard/pos must equal the md5-order replay")
    // per-shard positions are exactly 1..count — a true permutation
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions are not contiguous")
    }
  }

  test("q96 composes: strip -> empty -> dup -> short -> shard, first failing stage wins") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val longText = (1 to 24).map(i => s"t$i").mkString(" ") // 3 segments, 24 toks
    val dir = docsFixture(Seq(
      (0L, boiler, "srcA"),                 // df=2 in srcA -> fully stripped
      (1L, boiler, "srcA"),                 // -> BOTH empty_after_strip
      // the dup pair spans two sources: same-source identical docs would
      // be eaten by the boilerplate stage first (every segment df=2) —
      // composition order is the semantics, and the empty_after_strip
      // docs 0/1 pin exactly that case
      (2L, longText, "srcB"),               // first occurrence -> kept
      (3L, longText, "srcC"),               // identical clean text -> exact_dup
      (4L, "s1 s2 s3 s4 s5", "srcB"),       // 5 toks < 16 -> too_short
      (5L, longText + " u1 u2", "srcA")))   // kept (distinct text)
    val got = SparkEntry.queries("q96_corpus_prepare")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(4),
        Option(r.get(5)).map(_.asInstanceOf[Int]), Option(r.get(6)).map(_.asInstanceOf[Long])))
      .toMap
    assert(got(0L)._1 == "empty_after_strip" && got(1L)._1 == "empty_after_strip",
      s"all-boilerplate docs: ${got(0L)}, ${got(1L)}")
    assert(got(2L)._1 == "kept", s"first occurrence keeps: ${got(2L)}")
    assert(got(3L)._1 == "exact_dup", s"post-strip duplicate: ${got(3L)}")
    assert(got(4L)._1 == "too_short", s"short doc: ${got(4L)}")
    assert(got(5L)._1 == "kept", s"distinct doc keeps: ${got(5L)}")
    // only kept docs carry a shard/pos, and positions tile each shard 1..n
    val keptRows = got.filter(_._2._1 == "kept").values
    assert(keptRows.forall(v => v._2.isDefined && v._3.isDefined))
    assert(got.filter(_._2._1 != "kept").values.forall(v => v._2.isEmpty && v._3.isEmpty),
      "dropped docs must not be sharded")
    keptRows.groupBy(_._2.get).foreach { case (_, rows) =>
      assert(rows.map(_._3.get).toSeq.sorted == (1L to rows.size).toSeq)
    }
  }

  test("q98 replays the HRW argmax and moves docs ONLY onto new shards") {
    def hrw(id: Long, s: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hrw:$id:$s".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(15), 16)
    }
    def pick(id: Long, n: Int): Int = (0 until n).maxBy(s => (hrw(id, s), -s))
    val got = SparkEntry.queries("q98_shard_rebalance")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    got.foreach { case (id, o, n, m) =>
      assert(o == pick(id, 16) && n == pick(id, 20) && m == (o != n),
        s"doc $id: ($o, $n, $m) vs replay (${pick(id, 16)}, ${pick(id, 20)})")
    }
    // rendezvous invariant: growth never shuffles docs BETWEEN old shards
    got.filter(_._4).foreach { case (id, _, n, _) =>
      assert(n >= 16, s"doc $id moved onto OLD shard $n — HRW property violated")
    }
    // expected movement = 4/20; allow a generous band on the small corpus
    val frac = got.count(_._4).toDouble / got.length
    assert(frac > 0.10 && frac < 0.30, s"moved fraction $frac outside the 20% band")
  }

  test("q99 dataset card replays per-source, dups attributed to the later copy") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val firstSeen = scala.collection.mutable.Map.empty[String, Long]
    val dupIds = docs.sortBy(_._1).flatMap { case (id, _, _, t) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (firstSeen.contains(h)) Some(id) else { firstSeen(h) = id; None }
    }.toSet
    val expect = docs.groupBy(_._2).map { case (src, rows) =>
      val toks = rows.map(_._4.split(" ", -1).length.toLong)
      src -> (rows.length.toLong, toks.sum, rows.map(_._3).distinct.length.toLong,
        rows.count(r => dupIds(r._1)).toLong,
        1000000L * toks.count(_ < 16) / rows.length)
    }
    val got = SparkEntry.queries("q99_dataset_card")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expect, s"card mismatch:\n got=$got\n exp=$expect")
  }

  test("q93 verdicts: template collapses low, OOV gibberish spikes high, normal text keeps") {
    // doc 0 trains the template bigram (a,a); doc 3 trains the x/y/z/w
    // context model; docs 1/2/4 are scored only. The normal text is a
    // repeated de Bruijn-style cycle where every context is followed by
    // all 4 symbols near-uniformly, so per-bigram surprisal sits at
    // ~log2(4) = 2 bits — squarely inside the keep band.
    val normal = ("x x y x z x w y y z y w z z w w x " * 8).trim
    val dir = docsFixture(Seq(
      (0L, ("a " * 32).trim, "s"),          // model: c2(a,a)=31, c1(a)=31
      (3L, normal, "s"),                    // model: balanced contexts
      (1L, ("a " * 9).trim, "s"),           // template: all bits 0 -> millibits 0
      (2L, "zz qq ww ee rr tt yy uu", "s"), // gibberish: all OOV -> 20000
      (4L, normal, "s")))                   // in-model mixed text
    val got = SparkEntry.queries("q93_bigram_surprisal")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(got(1L)._1 == 0L && !got(1L)._2, s"template doc: ${got(1L)}")
    assert(got(2L)._1 == 20000L && !got(2L)._2, s"gibberish doc: ${got(2L)}")
    assert(got(4L)._2, s"normal doc must land in the keep band: ${got(4L)}")
    // replay doc 4 exactly against the model trained on doc 0 + doc 3
    // (doc 0 contributes only (a,a), which doc 4 never uses)
    val ts = normal.split(" ").toSeq
    val bg = ts.zip(ts.tail)
    val c2 = bg.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = bg.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val bits = bg.map(b => java.lang.Long.toBinaryString(c1(b._1) / c2(b)).length - 1L)
    val millibits = bits.sum * 1000 / bg.length
    assert(got(4L)._1 == millibits, s"doc 4 millibits ${got(4L)._1} != replay $millibits")
  }

  test("q109 funnel ledger accounts every stage's docs and tokens on the five-verdict fixture") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val longText = (1 to 24).map(i => s"t$i").mkString(" ")
    val dir = docsFixture(Seq(
      (0L, boiler, "srcA"), (1L, boiler, "srcA"),    // empty_after_strip ×2
      (2L, longText, "srcB"),                        // kept
      (3L, longText, "srcC"),                        // exact_dup of 2
      (4L, "s1 s2 s3 s4 s5", "srcB"),                // too_short
      (5L, longText + " u1 u2", "srcA")))            // kept
    val got = SparkEntry.queries("q109_funnel_ledger")(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // totals: 6 docs, 8+8+24+24+5+26 = 95 raw tokens
    assert(got(1) == (("empty_after_strip", 2L, 16L, 0L,
      1000000L * 2 / 6, 1000000L * 16 / 95)), s"stage 1: ${got.get(1)}")
    assert(got(2) == (("exact_dup", 1L, 24L, 24L,
      1000000L / 6, 1000000L * 24 / 95)), s"stage 2: ${got.get(2)}")
    assert(got(3) == (("too_short", 1L, 5L, 5L,
      1000000L / 6, 1000000L * 5 / 95)), s"stage 3: ${got.get(3)}")
    assert(got(4) == (("kept", 2L, 50L, 50L,
      1000000L * 2 / 6, 1000000L * 50 / 95)), s"stage 4: ${got.get(4)}")
    // conservation: every doc and raw token lands in exactly one stage
    assert(got.values.map(_._2).sum == 6L && got.values.map(_._3).sum == 95L)
  }

  test("q115 retrieval eval replays: gains, ideal ranking, MRR, and nDCG integers") {
    val w = Vector(1000000L, 630929L, 500000L, 430676L, 386852L)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSet))
    // graded gain = distinct query terms present in the doc
    val gains: Map[Int, Seq[(Long, Long)]] = graft.queries.Corpus.Bm25Queries.map {
      case (qid, txt) =>
        val ts = txt.split(" ").toSet
        qid -> docs.map { case (id, tok) => (id, ts.count(tok.contains).toLong) }
          .filter(_._2 > 0).toSeq
    }.toMap
    val top5 = SparkEntry.queries("q91_bm25_topk")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(4)))
    val got = SparkEntry.queries("q115_retrieval_eval")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    graft.queries.Corpus.Bm25Queries.foreach { case (qid, txt) =>
      val nTerms = txt.split(" ").length
      val cand = gains(qid)
      if (cand.nonEmpty) {
        val idcg = cand.sortBy(c => (-c._2, c._1)).take(5)
          .zipWithIndex.map { case ((_, g), i) => g * w(i) }.sum
        val mine = top5.filter(_._1 == qid).sortBy(_._2)
        val dcg = mine.map { case (_, rk, _, nh) => nh.toLong * w(rk - 1) }.sum
        val rFirst = mine.collectFirst { case (_, rk, _, nh) if nh == nTerms => rk }
        val mrr = rFirst.map(1000000L / _).getOrElse(0L)
        val nRel = cand.count(_._2 == nTerms).toLong
        val expect = (nTerms, nRel, mrr, dcg, idcg, 1000000L * dcg / idcg)
        assert(got(qid) == expect, s"qid $qid: got=${got(qid)} expect=$expect")
        // q91's top-5 gains never beat the ideal prefix
        assert(dcg <= idcg)
      }
    }
    // the eval must differentiate somewhere (an imperfect ranking exists)
    assert(got.values.exists(_._6 < 1000000L), "every query scored perfect nDCG")
  }

  test("q129 hybrid fusion equals a plain-Scala replay of both arms and the RRF") {
    val k0 = 60; val armK = 10; val topK = 5
    // lexical arm: the q91 BM25 math, self row dropped, cut at armK.
    // UNFILTERED split: the engine's dl/n_toks count every split token,
    // empties included (bm25ScoredOn's documented length convention) —
    // filtering here would only pass while the fixture has no
    // consecutive spaces. Empty tokens never equal a workload term, so
    // matching/tf are unaffected.
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val nDocs = docs.length.toLong
    val nToks = docs.map(_._2.length.toLong).sum
    val lexArm: Map[Int, Seq[(Long, Int)]] = graft.queries.Corpus.Bm25Queries.map {
      case (qid, qtext) =>
        val terms = qtext.split(" ").toSeq
        val dfOf = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
        qid -> docs.flatMap { case (id, ts) =>
          val hits = terms.filter(t => ts.contains(t))
          if (hits.isEmpty || id == qid) None else {
            val dl = ts.length.toLong
            val score = hits.map { t =>
              val tf = ts.count(_ == t).toLong
              val idf = math.log(1.0 + (nDocs - dfOf(t) + 0.5) / (dfOf(t) + 0.5))
              idf * (tf * 22 * nToks).toDouble /
                (10.0 * nToks * tf + 3.0 * nToks + 9.0 * dl * nDocs)
            }.sum
            Some((id, score))
          }
        }.sortBy { case (id, sc) => (-sc, id) }.take(armK)
          .zipWithIndex.map { case ((id, _), i) => (id, i + 1) }.toSeq
    }.toMap
    // vector arm: the q36 quantized-cosine math (HALF_UP like Spark round),
    // self excluded, cut at armK
    def q7(v: Float): Long = {
      val x = v.toDouble * 1e7
      (math.signum(x) * math.floor(math.abs(x) + 0.5)).toLong
    }
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(q7).toArray)
    val n2 = vecs.map { case (id, a) => id -> a.map(q => q * q).sum }.toMap
    val vecArm: Map[Int, Seq[(Long, Int)]] = graft.queries.Corpus.Bm25Queries.map {
      case (qid, _) =>
        val qa = vecs.find(_._1 == qid.toLong).get._2
        qid -> vecs.filter(_._1 != qid.toLong).map { case (id, a) =>
          val dot = qa.zip(a).map { case (x, y) => x * y }.sum
          (id, dot.toDouble / (math.sqrt(n2(qid.toLong).toDouble) * math.sqrt(n2(id).toDouble)))
        }.sortBy { case (id, c) => (-c, id) }.take(armK)
          .zipWithIndex.map { case ((id, _), i) => (id, i + 1) }.toSeq
    }.toMap
    // fusion: integer ppb contributions, rank by (-rrf, doc_id), cut topK
    val expect = graft.queries.Corpus.Bm25Queries.flatMap { case (qid, _) =>
      val lx = lexArm(qid).toMap; val vx = vecArm(qid).toMap
      (lx.keySet ++ vx.keySet).toSeq.map { id =>
        val rrf = lx.get(id).map(r => 1000000000L / (k0 + r)).getOrElse(0L) +
          vx.get(id).map(r => 1000000000L / (k0 + r)).getOrElse(0L)
        (id, rrf, lx.get(id), vx.get(id))
      }.sortBy { case (id, rrf, _, _) => (-rrf, id) }.take(topK)
        .zipWithIndex.map { case ((id, rrf, lr, vr), i) =>
          (qid, i + 1, id, rrf, lr, vr) }
    }.toSet
    val got = SparkEntry.queries("q129_hybrid_fusion")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5)))).toSet
    assert(got == expect, s"hybrid fusion mismatch:\n got=$got\n exp=$expect")
    // the fused list must draw on BOTH arms somewhere, else it's not hybrid
    assert(got.exists(_._5.isDefined) && got.exists(_._6.isDefined))
    // every qid serves a full page (the vector arm alone covers topK)
    graft.queries.Corpus.Bm25Queries.foreach { case (qid, _) =>
      assert(got.count(_._1 == qid) == topK) }
  }

  test("q130 vocab report equals a plain-Scala replay on a rich-vocabulary fixture") {
    import spark.implicits._
    // 20 docs, ids with a GAP (decile arithmetic must not assume dense
    // ids); vocabulary grows across docs; a double space plants an empty
    // token; counts span several log2 buckets
    val rows: Seq[(Long, String)] = (0L until 19L).map { i =>
      val id = if (i < 10) i else i + 5 // ids 0..9, 15..23 (max 23)
      val common = Seq.fill(4)("alpha") ++ Seq.fill(2)("beta")
      val fresh = Seq.tabulate(3)(j => s"tok_${id}_$j") // 3 new types per doc
      val rare = if (id % 4 == 0) Seq("rare") else Nil
      id -> (common ++ fresh ++ rare).mkString(" ")
    } :+ (24L -> "alpha  beta gamma") // double space -> empty token filtered
    def replay(corpus: Seq[(Long, String)]) = {
      val toks = corpus.flatMap { case (id, t) =>
        t.split(" ", -1).filter(_.nonEmpty).map(id -> _) }
      val maxd = corpus.map(_._1).max
      val types = toks.groupBy(_._2).map { case (tok, occ) =>
        (tok, occ.size.toLong, occ.map(_._1).min) }.toSeq
      def lb(c: Long) = 63 - java.lang.Long.numberOfLeadingZeros(c)
      val spec = types.groupBy(t => lb(t._2)).map { case (b, ts) =>
        ("spectrum", b, ts.size.toLong, ts.map(_._2).sum, -b) }.toSeq
      def dec(id: Long) = (id * 10 / (maxd + 1)).toInt
      val hpT = types.groupBy(t => dec(t._3)).map { case (d, ts) => d -> ts.size.toLong }
      val heaps = toks.groupBy(t => dec(t._1)).map { case (d, occ) =>
        ("heaps", d, hpT.getOrElse(d, 0L), occ.size.toLong, d) }.toSeq
      val base = spec ++ heaps
      val tot = base.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._4).sum }
      base.map { case (k, b, nt, nk, ok) =>
        val cumT = base.filter(r => r._1 == k && r._5 <= ok).map(_._3).sum
        val cumK = base.filter(r => r._1 == k && r._5 <= ok).map(_._4).sum
        (k, b, nt, nk, cumT, 1000000L * cumK / tot(k))
      }.toSet
    }
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // rich fixture: exercises gaps, empty-token filtering, multi-bucket
    // spectrum, and types first seen in later deciles
    val gotF = collect(graft.queries.Corpus.vocabReportOn(rows.toDF("doc_id", "text")))
    assert(gotF == replay(rows), s"fixture mismatch:\n got=$gotF\n exp=${replay(rows)}")
    assert(gotF.count(_._1 == "spectrum") >= 3, "fixture spectrum should span buckets")
    // the Heaps section must show vocabulary still growing past decile 0
    assert(gotF.exists(r => r._1 == "heaps" && r._2 > 0 && r._3 > 0))
    // and the registered query agrees with the same replay on the testdata
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val got = collect(SparkEntry.queries("q130_vocab_report")(spark, sfDir))
    assert(got == replay(docs), s"testdata mismatch:\n got=$got\n exp=${replay(docs)}")
  }

  test("q106 churn report equals the per-doc generation-status replay") {
    val got = SparkEntry.queries("q106_snapshot_churn")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    def u60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15), 16)
    // replay: h20 decides each doc's fate — 0 absent from gen A (added),
    // 1 absent from gen B (removed), 2 re-crawled with edited content
    // (changed), else byte-identical (unchanged)
    def status(id: Long): String = (u60(s"gen:$id") % 20) match {
      case 0 => "added"
      case 1 => "removed"
      case 2 => "changed"
      case _ => "unchanged"
    }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.groupBy(_._2).foreach { case (src, v) =>
      val st = v.map(d => status(d._1))
      val expect = (st.count(_ == "added").toLong, st.count(_ == "removed").toLong,
        st.count(_ == "changed").toLong, st.count(_ == "unchanged").toLong,
        st.size.toLong, 1000000L * st.count(_ != "unchanged") / st.size)
      assert(got(src) == expect, s"source $src: got=${got(src)} expect=$expect")
    }
    // the synthetic delta must exercise every status class somewhere
    assert(got.values.map(_._1).sum > 0 && got.values.map(_._2).sum > 0 &&
      got.values.map(_._3).sum > 0 && got.values.map(_._4).sum > 0)
  }

  test("q91 BM25 scores are permutation-invariant (canonical-order fold)") {
    import spark.implicits._
    // multi-term-hit docs so the per-(qid, doc) fold has >1 addend — the
    // case where a bare SUM's partition-dependent IEEE order could drift
    val docs = (0L until 64L).map { id =>
      val filler = (0 until (id % 7).toInt).map(j => s"f${id}_$j")
      val hits = Seq("spark", "table", "join", "window", "agg", "stream")
        .take(1 + (id % 6).toInt)
      (id, (hits ++ filler ++ hits).mkString(" "))
    }.toDF("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), (Double, Int)] =
      graft.queries.Corpus.bm25ScoredOn(df).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getDouble(2), r.getInt(3)))).toMap
    val base = scores(docs.coalesce(1))
    // three hostile arrangements: different partition counts and a
    // reversed row order — the collect_list arrival order differs in all
    val perms = Seq(docs.repartition(7), docs.repartition(3, col("text")),
      docs.orderBy(col("doc_id").desc).repartition(5))
    perms.foreach { p =>
      val got = scores(p)
      assert(got.keySet == base.keySet)
      // EXACT double equality, not rounded: the fold's accumulation
      // sequence itself must be canonical
      got.foreach { case (k, v) =>
        assert(v == base(k), s"score for $k drifted: $v vs ${base(k)}")
      }
    }
    // sanity: some group genuinely folds >1 term
    assert(base.exists(_._2._2 > 1))
  }

  test("q154 skew profile: the planted heavy hitter tops the ranking with the right salt") {
    // a Zipf cartoon: one token carrying ~92% of the corpus, nine
    // singletons — the exact geometry the salt factor exists for
    val dir = docsFixture(Seq(
      (0L, (1 to 100).map(_ => "h").mkString(" "), "s"),
      (1L, (1 to 9).map(i => s"u$i").mkString(" "), "s")))
    val got = SparkEntry.queries("q154_skew_profile")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // plain-Scala replay of the integer arithmetic
    val counts = Map("h" -> 100L) ++ (1 to 9).map(i => s"u$i" -> 1L)
    val total = 109L
    val target = total / 32 + 1
    val want = counts.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex.map {
      case ((t, c), i) =>
        (i + 1, t, c, c * 1000000L / total, (c + target - 1) / target,
          counts.size.toLong, total)
    }
    assert(got == want, s"skew profile mismatch:\n got=$got\nwant=$want")
    // the headline number: the hitter needs salting, the tail does not
    assert(got.head._5 == 25L && got.tail.forall(_._5 == 1L))
  }
}
