package graft

import java.sql.Timestamp
import graft.streaming.Streams
import graft.streaming.Streams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantics: the windowed summary over a stream must equal the
  * same aggregation run as a batch (exactly the D4 ↔ Structured Streaming
  * equivalence the module claims), and the sessionizer must close
  * sessions on gaps. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming windowed summary converges to the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = Streams.windowedSummary(mem.toDF())
      .writeStream.format("memory").queryName("win_sum")
      .outputMode("append").start()

    val events = Seq(
      Event(1, ts("2024-01-01 01:00:00"), 1, "click", 10.0),
      Event(2, ts("2024-01-01 02:00:00"), 2, "click", 5.0),
      Event(3, ts("2024-01-01 03:00:00"), 1, "purchase", 100.0),
      Event(4, ts("2024-01-02 01:00:00"), 1, "click", 7.0))
    mem.addData(events: _*)
    query.processAllAvailable()
    // advance the watermark far enough to close both windows
    mem.addData(Event(99, ts("2024-01-10 00:00:00"), 9, "view", 1.0))
    query.processAllAvailable()

    val streamed = spark.table("win_sum")
      .select("w_start", "event_type", "n", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    query.stop()

    val expect = events.toDF()
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start"), col("event_type"), col("n"), col("total_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == expect)
  }

  test("streaming quantile-sketch histogram readout matches batch q77 exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = Streams.quantileSketch(mem.toDF())
      .writeStream.format("memory").queryName("qsketch")
      .outputMode("complete").start()
    // replay the REAL sf0.001 events through the stream in two batches
    // (arbitrary split — complete-mode aggregation must not care)
    val events = Tables.events(spark, sfDir).collect().map(r =>
      Event(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val (a, b) = events.splitAt(events.length / 3)
    mem.addData(a.toIndexedSeq: _*); query.processAllAvailable()
    mem.addData(b.toIndexedSeq: _*); query.processAllAvailable()
    val hist = spark.table("qsketch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    query.stop()

    // q77's readout, replayed in plain Scala over the STREAMED state
    val got = hist.groupBy(_._1).map { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      val n = sorted.map(_._3).sum
      def pick(q: Int): Double = {
        val k = (n - 1) * q / 100 + 1
        var below = 0L
        sorted.collectFirst {
          case (_, _, cnt, bmn) if { val hit = below < k && k <= below + cnt; if (!hit) below += cnt; hit } =>
            bmn.toDouble / 1e6
        }.get
      }
      et -> (n, pick(25), pick(50), pick(75), pick(95))
    }
    val expect = SparkEntry.queries("q77_quantile_sketch")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got == expect, s"streamed readout diverged:\ngot=$got\nexpect=$expect")
  }

  test("stateless streaming band keys are bit-identical to the batch wide aggregate") {
    val docs = Tables.documentsWide(spark, sfDir).select("doc_id", "text")
    val stateless = graft.queries.Dedup.minhashBandKeysOf(
        docs.withColumn("ts", lit(ts("2024-01-01 00:00:00"))))
      .select("doc_id", "band", "bandkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val agg = graft.queries.Dedup.minhashBandsOf(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(stateless.nonEmpty && stateless == agg,
      "streaming and batch signature definitions diverged")
  }

  test("streaming MinHash-band candidates equal the batch bucketing on a replayed corpus") {
    implicit val sqlCtx = spark.sqlContext
    // replay the REAL sf0.001 documents in doc_id (= event-time) order
    // across three arbitrary micro-batch splits
    val docs = Tables.documentsWide(spark, sfDir).select("doc_id", "text").collect()
      .map(r => Streams.Doc(r.getLong(0),
        new Timestamp(ts("2024-01-01 00:00:00").getTime + r.getLong(0) * 1000L), r.getString(1)))
      .sortBy(_.doc_id)
    val mem = MemoryStream[Streams.Doc]
    val query = Streams.minhashCandidates(mem.toDF())
      .writeStream.format("memory").queryName("mh_cand")
      .outputMode("append").start()
    val (a, rest) = docs.splitAt(docs.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    Seq(a, b, c).foreach { batch =>
      mem.addData(batch.toIndexedSeq: _*)
      query.processAllAvailable()
    }
    val streamed = spark.table("mh_cand").select("d1", "d2").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // push the watermark a horizon past the last arrival: idle buckets
    // time out and their state is dropped (the bounded-state contract)
    mem.addData(Streams.Doc(999999L, ts("2024-06-01 00:00:00"), "zz zz"))
    query.processAllAvailable()
    mem.addData(Streams.Doc(999998L, ts("2024-07-01 00:00:00"), "yy yy"))
    query.processAllAvailable()
    val cleaned = query.lastProgress.stateOperators
    query.stop()
    val batchCand = graft.queries.Dedup.minhashCandidatesOf(
        graft.queries.Dedup.minhashBandsOf(Tables.documentsWide(spark, sfDir).select("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty && streamed == batchCand,
      s"stream/batch candidate sets diverged: only-stream=${(streamed -- batchCand).take(5)} only-batch=${(batchCand -- streamed).take(5)}")
    assert(cleaned.exists(_.numRowsTotal < docs.length.toLong * 4),
      "bucket state was never cleaned up by the event-time timeout")
  }

  test("sessionizer closes sessions after the gap and aggregates within") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = Streams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
      // > 30 min gap → new session
      Event(3, ts("2024-01-01 11:00:00"), 1, "click", 4.0),
      // other user, single event
      Event(4, ts("2024-01-01 10:05:00"), 2, "view", 8.0))
    query.processAllAvailable()
    // push watermark way forward so timeouts fire and all sessions close
    mem.addData(Event(99, ts("2024-01-02 12:00:00"), 9, "view", 0.0))
    query.processAllAvailable()
    mem.addData(Event(100, ts("2024-01-03 12:00:00"), 9, "view", 0.0))
    query.processAllAvailable()
    val out = spark.table("sessions").as[Streams.Session].collect()
    query.stop()

    val u1 = out.filter(_.user_id == 1).sortBy(_.start.getTime)
    assert(u1.length == 2, s"expected 2 sessions for user 1, got ${u1.toSeq}")
    assert(u1(0).n_events == 2 && u1(0).total_value == 3.0)
    assert(u1(1).n_events == 1 && u1(1).total_value == 4.0)
    assert(out.count(_.user_id == 2) == 1)
  }

  test("out-of-order event more than a gap before the open session stays separate") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = Streams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    // batch 1 opens a session at 10:00
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
    query.processAllAvailable()
    // batch 2 delivers a non-late event 50 min EARLIER — batch semantics
    // put a >30 min gap between them, so it must not merge
    mem.addData(Event(2, ts("2024-01-01 09:10:00"), 1, "click", 2.0))
    query.processAllAvailable()
    mem.addData(Event(99, ts("2024-01-02 12:00:00"), 9, "view", 0.0))
    query.processAllAvailable()
    mem.addData(Event(100, ts("2024-01-03 12:00:00"), 9, "view", 0.0))
    query.processAllAvailable()
    val out = spark.table("sessions_ooo").as[Streams.Session].collect()
      .filter(_.user_id == 1).sortBy(_.start.getTime)
    query.stop()
    assert(out.length == 2, s"expected 2 sessions, got ${out.toSeq}")
    assert(out(0).start == ts("2024-01-01 09:10:00") && out(0).n_events == 1)
    assert(out(1).start == ts("2024-01-01 10:00:00") && out(1).n_events == 1)
  }

  test("two early out-of-order events in ONE batch merge into one session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = Streams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_ooo2")
      .outputMode("append").start()
    // batch 1 opens a session at 10:00
    mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
    query.processAllAvailable()
    // batch 2 delivers TWO non-late events (inside the 1 h watermark)
    // well before the open session that are within a gap of EACH OTHER —
    // batch semantics make them one 2-event session, not two singletons
    mem.addData(
      Event(2, ts("2024-01-01 09:05:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 09:15:00"), 1, "click", 4.0))
    query.processAllAvailable()
    mem.addData(Event(99, ts("2024-01-02 12:00:00"), 9, "view", 0.0))
    query.processAllAvailable()
    mem.addData(Event(100, ts("2024-01-03 12:00:00"), 9, "view", 0.0))
    query.processAllAvailable()
    val out = spark.table("sessions_ooo2").as[Streams.Session].collect()
      .filter(_.user_id == 1).sortBy(_.start.getTime)
    query.stop()
    assert(out.length == 2, s"expected 2 sessions, got ${out.toSeq}")
    assert(out(0).start == ts("2024-01-01 09:05:00") &&
      out(0).end == ts("2024-01-01 09:15:00") &&
      out(0).n_events == 2 && out(0).total_value == 6.0)
    assert(out(1).start == ts("2024-01-01 10:00:00") && out(1).n_events == 1)
  }

  test("partitioned streaming sink lands each micro-batch idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[Event]
    val q = Streams.startPartitionedSink(
      Streams.windowedSummary(mem.toDF()), s"$dir/out", s"$dir/ckpt")
    mem.addData(
      Event(1, ts("2024-01-01 01:00:00"), 1, "click", 10.0),
      Event(2, ts("2024-01-01 02:00:00"), 2, "click", 5.0))
    q.processAllAvailable()
    mem.addData(Event(9, ts("2024-01-09 00:00:00"), 9, "view", 1.0)) // closes the window
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out")
    // the closed 2024-01-01 click window arrived exactly once
    assert(out.filter(col("event_type") === "click").count() == 1)
    val row = out.filter(col("event_type") === "click").collect().head
    assert(row.getAs[Long]("n") == 2 && row.getAs[Double]("total_value") == 15.0)
    // batch partitions exist (the replay unit)
    assert(out.columns.contains("batch"))
  }

  test("streaming exact dedup keeps first-seen per content hash, watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Doc]
    val query = Streams.streamingExactDedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    mem.addData(
      Streams.Doc(1, ts("2024-01-01 10:00:00"), "same text"),
      Streams.Doc(2, ts("2024-01-01 10:05:00"), "same text"),   // dup in batch
      Streams.Doc(3, ts("2024-01-01 10:10:00"), "other text"))
    query.processAllAvailable()
    mem.addData(Streams.Doc(4, ts("2024-01-01 11:00:00"), "same text")) // dup across batches
    query.processAllAvailable()
    val out = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
    query.stop()
    assert(out == Set(1L, 3L), s"expected first-seen docs only, got $out")
  }

  test("intake flow dedups, enforces the quality floor, and scrubs PII in one pass") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Doc]
    val good = ("data " * 60).trim // 60 non-stopword tokens → quality 1.0
    val query = Streams.intake(mem.toDF())
      .writeStream.format("memory").queryName("intake")
      .outputMode("append").start()
    mem.addData(
      Streams.Doc(1, ts("2024-01-01 10:00:00"), good),
      Streams.Doc(2, ts("2024-01-01 10:05:00"), good),            // exact dup → dropped
      Streams.Doc(3, ts("2024-01-01 10:10:00"), "the a is the a"), // all stopwords → quality 0
      Streams.Doc(4, ts("2024-01-01 10:15:00"), good + " mail me2@ex.org x"))
    query.processAllAvailable()
    val out = spark.table("intake").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    query.stop()
    assert(out.keySet == Set(1L, 4L), s"expected dedup + quality drop, got ${out.keySet}")
    assert(out(4L).contains("<EMAIL>") && !out(4L).contains("me2@ex.org"),
      "PII must be scrubbed in the surviving feed")
    assert(out(1L) == good, "clean docs pass through byte-identical")
    // the streamed rule_mask is the batch battery's verdict (q65's exact
    // definition): doc 1 = 60 clean words but zero stopwords → bit 6
    val masks = spark.table("intake").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rule_mask")).toMap
    assert(masks(1L) == 64, s"doc 1 mask ${masks(1L)}: expected only the stopword-floor bit")
  }

  test("streaming bigram scorer under the frozen model equals batch q93 on a replayed corpus") {
    implicit val sqlCtx = spark.sqlContext
    // freeze q93's trained model as the PRUNED serving artifact — on
    // the fixture (far below the cap) it must equal the full relation,
    // so the stream/batch equality below also certifies the prune
    val full = graft.queries.Corpus.bigramModel(spark, sfDir).collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}" -> r.getLong(2)).toMap
    val model = graft.queries.Corpus.frozenBigramModel(spark, sfDir)
    assert(model.nonEmpty, "frozen model must not be empty")
    assert(model == full, "under the cap, the pruned serving model IS the full model")
    // under an artificial cap the prune keeps exactly the top-M by
    // (count desc, w1, w2) — replayed from the training relation
    val byCount = graft.queries.Corpus.bigramModel(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy { case (w1, w2, _, c2) => (-c2, w1, w2) }
    val m = 7
    val want = byCount.take(m).map { case (w1, w2, bits, _) => s"$w1 $w2" -> bits }.toMap
    assert(graft.queries.Corpus.frozenBigramModel(spark, sfDir, m) == want,
      "capped serving model is not the top-M most-frequent bigrams")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => Streams.Doc(r.getLong(0), ts("2024-01-01 10:00:00"), r.getString(1)))
    val mem = MemoryStream[Streams.Doc]
    val query = Streams.bigramScore(mem.toDS(), model)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").start()
    mem.addData(docs.toIndexedSeq: _*)
    query.processAllAvailable()
    val streamed = spark.table("lm_stream")
      .select("doc_id", "n_bigrams", "total_bits", "millibits", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    query.stop()
    val batch = SparkEntry.queries("q93_bigram_surprisal")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(streamed == batch, "frozen-model stream scoring must equal the batch relation")
  }

  test("streaming DSIR scorer under the frozen model equals batch q170 on a replayed corpus") {
    implicit val sqlCtx = spark.sqlContext
    val (weights, wDefault, nRaw, sumMb) =
      graft.queries.Curation.dsirFrozenModel(spark, sfDir)
    graft.Caches.release()
    assert(weights.nonEmpty && weights.size <= graft.queries.Curation.DsirBuckets,
      "weight map must be non-empty and bucket-bounded")
    // replay the raw (non-curated) pool — the slice the batch query
    // scores and the slice a serving intake consists of
    val docs = Tables.documents(spark, sfDir)
      .filter(!col("source").isin("src0", "src1", "src2", "src3"))
      .select("doc_id", "text").collect()
      .map(r => Streams.Doc(r.getLong(0), ts("2024-01-01 10:00:00"), r.getString(1)))
    assert(docs.nonEmpty, "fixture must have raw docs")
    val mem = MemoryStream[Streams.Doc]
    val query = Streams.dsirScore(mem.toDS(), weights, wDefault, nRaw, sumMb)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    mem.addData(docs.toIndexedSeq: _*)
    query.processAllAvailable()
    val streamed = spark.table("dsir_stream")
      .select("doc_id", "n_feats", "weight_bits", "w_mb", "selected").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    query.stop()
    val batch = SparkEntry.queries("q170_dsir_select")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(streamed == batch, "frozen-model stream scoring must equal the batch selection")
  }

  test("streaming containment scorer against the frozen artifact equals batch q179's corpus arm") {
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.IncrementalContain
    val idx = IncrementalContain.buildIndex(spark, sfDir)
    val shardDf = spark.read.parquet(s"${IncrementalContain.stageShard(spark, sfDir)}/docs")
    val batch = IncrementalContain.verdictsAgainst(spark, shardDf, idx).collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(3)))
    graft.Caches.release()
    val want = batch.filter(_._2 == "contained_in_corpus")
      .map(t => t._1 -> t._3.asInstanceOf[Long]).toMap
    assert(want.nonEmpty, "fixture must plant corpus containments")
    val docs = shardDf.collect()
      .map(r => Streams.Doc(r.getLong(0), ts("2024-01-01 10:00:00"), r.getString(1)))
    val mem = MemoryStream[Streams.Doc]
    val query = Streams.containScore(mem.toDS(), IncrementalContain.postex(spark, idx))
      .writeStream.format("memory").queryName("contain_stream")
      .outputMode("append").start()
    mem.addData(docs.toIndexedSeq: _*)
    query.processAllAvailable()
    // at-least-once delivery: replay the whole feed; min(container) is
    // duplicate-insensitive so no verdict may change
    mem.addData(docs.toIndexedSeq: _*)
    query.processAllAvailable()
    // a junk far-future doc (unseen tokens, >= MinSet shingles so its
    // prefix rows carry the watermark) closes the window
    mem.addData(Streams.Doc(999999L, ts("2024-06-01 00:00:00"), "zz1 zz2 zz3 zz4 zz5 zz6"))
    query.processAllAvailable()
    val streamed = spark.table("contain_stream")
      .select("doc_id", "container").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    query.stop()
    assert(streamed == want,
      "stream corpus-containment verdicts must equal the batch arm (same containers)")
  }

  test("batch q25 sessionization agrees with the streaming sessionizer") {
    // same events, two execution models (D3 applied to batch vs stream):
    // session (user, n_events, total_value) multisets must match.
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id") < 10)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = Streams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_xcheck")
      .outputMode("append").start()
    mem.addData(ev: _*)
    query.processAllAvailable()
    mem.addData(Event(-1, ts("2030-01-01 00:00:00"), -1, "view", 0.0))
    query.processAllAvailable()
    mem.addData(Event(-2, ts("2031-01-01 00:00:00"), -1, "view", 0.0))
    query.processAllAvailable()
    val streamed = spark.table("sessions_xcheck").as[Streams.Session].collect()
      .filter(_.user_id >= 0)
      .map(s => (s.user_id, s.n_events, math.round(s.total_value * 100)))
      .groupBy(identity).view.mapValues(_.size).toMap
    query.stop()

    val batch = graft.queries.Analytics.queries("q25_sessionize")(spark, sfDir)
      .filter(col("user_id") < 10)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("n_events")).toInt,
                 math.round(r.getDouble(r.fieldIndex("total_value")) * 100)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(streamed == batch)
  }

  test("batch q57 as-of join agrees with the streaming as-of state machine") {
    // same in-order feed, two execution models: every purchase's matched
    // (click_id, click_tsu) must be identical.
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id") < 25)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = Streams.asofJoin(mem.toDS())
      .writeStream.format("memory").queryName("asof_xcheck")
      .outputMode("append").start()
    // split the ordered feed across two micro-batches to exercise the
    // cross-batch click state
    val (first, second) = ev.splitAt(ev.length / 2)
    mem.addData(first: _*)
    query.processAllAvailable()
    mem.addData(second: _*)
    query.processAllAvailable()
    val streamed = spark.table("asof_xcheck").collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)).map(_.asInstanceOf[Long]),
                                 Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    query.stop()

    val batch = SparkEntry.queries("q57_asof_join")(spark, sfDir)
      .filter(col("user_id") < 25)
      .collect()
      .map { r =>
        val cid = if (r.isNullAt(4)) None else Some(r.getLong(4))
        val ctsu = if (r.isNullAt(5)) None else Some(r.getLong(5))
        r.getLong(0) -> ((cid, ctsu))
      }.toMap
    assert(streamed == batch)
  }

  test("streaming corpus-prepare twin matches batch q96 row-for-row on the shared fixture") {
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Corpus
    val docsDf = Tables.documentsWide(spark, sfDir)
    // the FROZEN boilerplate artifact: the batch relation, collected —
    // the offline-train/online-serve split the twin's contract names
    val boiler = Corpus.frozenBoiler(docsDf)
    assert(boiler.nonEmpty, "fixture has no boilerplate — strip untestable")
    val feed = docsDf.select("doc_id", "source", "text").collect().map(r =>
      Streams.CorpusDoc(r.getLong(0), ts("2024-01-01 00:00:00"), r.getString(1), r.getString(2)))
    val mem = MemoryStream[Streams.CorpusDoc]
    val query = Streams.corpusPrepare(mem.toDS(), boiler)
      .writeStream.format("memory").queryName("corpus_prep")
      .outputMode("append").start()
    mem.addData(feed.toIndexedSeq: _*)
    query.processAllAvailable()
    def rows(t: String) = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4),
        if (r.isNullAt(5)) None else Some(r.getInt(5))))
    val streamed = rows("corpus_prep").toSet
    // batch q96 minus `pos` — the corpus-total rank is the batch
    // finalization the twin deliberately omits; shard must agree
    val batch = SparkEntry.queries("q96_corpus_prepare")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4),
        if (r.isNullAt(5)) None else Some(r.getInt(5)))).toSet
    assert(streamed == batch, {
      val extra = streamed -- batch; val missing = batch -- streamed
      s"stream/batch divergence\n extra: ${extra.take(5)}\n missing: ${missing.take(5)}"
    })
    // cross-batch dedup state: replay a kept doc in a LATER micro-batch
    // within the horizon — it must come back exact_dup, not kept
    val keptDoc = rows("corpus_prep").filter(_._5 == "kept").map(_._1).min
    val replay = feed.find(_.doc_id == keptDoc).get
    mem.addData(replay.copy(ts = ts("2024-01-01 06:00:00")))
    query.processAllAvailable()
    val replayed = rows("corpus_prep").filter(r => r._1 == keptDoc).map(_._5).toSeq.sorted
    query.stop()
    assert(replayed == Seq("exact_dup", "kept"),
      s"replayed kept doc $keptDoc verdicts: $replayed")
  }

  test("frozen boilerplate serving artifact is per-source top-M bounded and equals the full relation under the cap") {
    import spark.implicits._
    import graft.queries.Corpus
    // 1. on the fixture (per-source boilerplate far below the cap) the
    //    pruned serving artifact IS the full batch relation — the twin
    //    above strips against exactly what batch q90 computed
    val boiler = Corpus.boilerOf(Corpus.segmented(Tables.documentsWide(spark, sfDir)))
    val full = boiler.select("source", "skey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(full.nonEmpty)
    assert(Corpus.frozenBoiler(Tables.documentsWide(spark, sfDir)) == full)
    // 2. a synthetic df spectrum that OVERFLOWS the cap: the prune keeps
    //    exactly each source's M highest-df keys (skey tiebreak), so the
    //    collect is sources × M by construction
    val m = 5
    val syn = (for {
      src <- Seq("sA", "sB")
      k <- 0 until 40
    } yield (src, k.toLong, 2L + (k % 7))).toDF("source", "skey", "df")
    val got = Corpus.prunedBoiler(syn, m).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length == m, s"$src serving set must be exactly M=$m rows")
    }
    // plain-Scala replay of the (df desc, skey asc) top-M
    val expect = (for {
      src <- Seq("sA", "sB")
    } yield src -> (0 until 40).map(k => (k.toLong, 2L + (k % 7)))
      .sortBy { case (skey, df) => (-df, skey) }.take(m)
      .map { case (skey, df) => (src, skey, df) }.toSet).toMap
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.toSet == expect(src), s"$src pruned set is not the top-M by (df desc, skey)")
    }
  }

  test("streaming media-verdict twin matches batch q101 row-for-row on the shared index") {
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.IncrementalMediaDedup
    import graft.functions.Multimodal.MediaRow
    val idx = IncrementalMediaDedup.buildIndex(spark, sfDir)
    val shardP = IncrementalMediaDedup.stageShard(spark, sfDir)
    val shard = spark.read.parquet(s"$shardP/media").as[MediaRow]
    val batch = IncrementalMediaDedup.verdictsAgainst(spark, shard, idx).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet

    // the FROZEN index relations, exactly as the artifact persists them
    val exact = spark.read.parquet(s"$idx/exact")
    val buckets = Streams.mediaBandBuckets(spark.read.parquet(s"$idx/bands"))
    val feed = shard.collect().map(m =>
      Streams.MediaDoc(m.doc_id, ts("2024-01-01 00:00:00"), m.media_type, m.payload))
    val mem = MemoryStream[Streams.MediaDoc]
    val query = Streams.mediaVerdicts(mem.toDS(), exact, buckets)
      .writeStream.format("memory").queryName("media_verd")
      .outputMode("append").start()
    mem.addData(feed.toIndexedSeq: _*)
    query.processAllAvailable()
    def rows() = spark.table("media_verd").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val streamed = rows().toSet
    assert(streamed == batch, {
      val extra = streamed -- batch; val missing = batch -- streamed
      s"stream/batch divergence\n extra: ${extra.take(5)}\n missing: ${missing.take(5)}"
    })
    // the staged mix guarantees all three exact-family verdicts appear
    val kinds = streamed.map(_._3)
    assert(Set("kept", "exact_dup_corpus", "exact_dup_batch").subsetOf(kinds),
      s"staged mix degenerate: $kinds")
    // cross-batch state: the same payload under a NEW intake id in a
    // later micro-batch within the horizon must verdict exact_dup_batch
    val keptId = rows().filter(_._3 == "kept").map(_._1).min
    val replay = feed.find(_.doc_id == keptId).get
    mem.addData(replay.copy(doc_id = keptId + 9000000L, ts = ts("2024-01-01 06:00:00")))
    query.processAllAvailable()
    val rep = rows().filter(_._1 == keptId + 9000000L).map(_._3).toSeq
    query.stop()
    assert(rep == Seq("exact_dup_batch"), s"replayed kept media verdicts: $rep")
  }

  test("streaming novelty audit equals batch q111 via the frozen reference artifact") {
    def u60(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15), 16)
    val ref = graft.queries.Curation.referenceGrams(spark, sfDir)
    val cand = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, _) => u60(s"ref:$id") % 10 >= 3 }
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Doc]
    val query = Streams.noveltyAudit(mem.toDS(), ref)
      .writeStream.format("memory").queryName("novelty_stream")
      .outputMode("append").start()
    mem.addData(cand.map { case (id, t) =>
      Streams.Doc(id, ts("2024-01-01 01:00:00"), t) }.toIndexedSeq: _*)
    query.processAllAvailable()
    // a later doc (with enough tokens to emit gram rows) advances the
    // watermark past the first window's end; its own window stays open
    mem.addData(Streams.Doc(999999L, ts("2024-01-10 00:00:00"),
      "w w w w w w w w"))
    query.processAllAvailable()
    val streamed = spark.table("novelty_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    query.stop()
    val batch = SparkEntry.queries("q111_novelty_audit")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(streamed == batch,
      s"stream ${streamed.size} rows vs batch ${batch.size}")
  }

  test("lexScore query stream over the frozen index equals q131's serve") {
    implicit val sqlCtx = spark.sqlContext
    val idx = graft.queries.LexIndex.fullIndex(spark, sfDir)
    val mem = MemoryStream[Streams.LexQuery]
    val query = Streams.lexScore(mem.toDS(),
        spark.read.parquet(s"$idx/postings"), spark.read.parquet(s"$idx/stats"))
      .writeStream.format("memory").queryName("lex_stream")
      .outputMode("append").start()
    mem.addData(graft.queries.Corpus.Bm25Queries.map { case (qid, txt) =>
      Streams.LexQuery(qid, ts("2024-01-01 01:00:00"), txt) }: _*)
    query.processAllAvailable()
    // a later query advances the watermark past the workload's window
    // (its terms need not match anything — the watermark rides the
    // pre-join term relation)
    mem.addData(Streams.LexQuery(999, ts("2024-01-10 00:00:00"), "zzz_unmatched"))
    query.processAllAvailable()
    val streamed = spark.table("lex_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    query.stop()
    assert(streamed.nonEmpty && streamed.forall(_._1 != 999))
    // the consumer's bounded per-query cut (bm25TopK's exact contract:
    // score desc / doc_id, depth 5, HALF_UP 4-decimal rounding) over
    // the streamed scored rows must reproduce q131 row for row
    val top = streamed.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy { case (_, doc, sc, _) => (-sc, doc) }.take(5).zipWithIndex
        .map { case ((_, doc, sc, nh), i) =>
          (qid, i + 1, doc,
            BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, nh)
        }
    }.sortBy(r => (r._1, r._2))
    val batch = SparkEntry.queries("q131_lex_index_serve")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
      .toSeq
    assert(top == batch, s"stream+cut:\n$top\nbatch q131:\n$batch")
  }

  test("lexScore honors a takedown: the tombstone-masked stream equals the tombstoned batch serve") {
    // the streaming arm must not leak removals the batch arm honors
    // (round-13's q135 lesson, applied to the ONLINE serve): the caller
    // passes the masked postings + summed stats — the same relations
    // q133's batch serve reads — and the stream's bounded cut must
    // reproduce the tombstoned batch row for row, with the removed ids
    // absent from the raw stream entirely
    implicit val sqlCtx = spark.sqlContext
    val idx = graft.queries.LexIndex.fullIndex(spark, sfDir)
    val tomb = graft.queries.LexIndex.fullTombstone(spark, sfDir)
    val removed = spark.read.parquet(s"$tomb/ids").collect().map(_.getLong(0)).toSet
    assert(removed.nonEmpty, "fixture request removed nothing — test is vacuous")
    val postings = spark.read.parquet(s"$idx/postings")
      .join(broadcast(spark.read.parquet(s"$tomb/ids")), Seq("doc_id"), "left_anti")
    val stats = spark.read.parquet(s"$idx/stats")
      .unionByName(spark.read.parquet(s"$tomb/stats"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_toks")).as("n_toks"))
    val mem = MemoryStream[Streams.LexQuery]
    val query = Streams.lexScore(mem.toDS(), postings, stats)
      .writeStream.format("memory").queryName("lex_tomb_stream")
      .outputMode("append").start()
    mem.addData(graft.queries.Corpus.Bm25Queries.map { case (qid, txt) =>
      Streams.LexQuery(qid, ts("2024-01-01 01:00:00"), txt) }: _*)
    query.processAllAvailable()
    mem.addData(Streams.LexQuery(999, ts("2024-01-10 00:00:00"), "zzz_unmatched"))
    query.processAllAvailable()
    val streamed = spark.table("lex_tomb_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    query.stop()
    assert(streamed.nonEmpty && streamed.forall(r => !removed(r._2)),
      "a removed doc id surfaced in the takedown-masked stream")
    val top = streamed.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy { case (_, doc, sc, _) => (-sc, doc) }.take(5).zipWithIndex
        .map { case ((_, doc, sc, nh), i) =>
          (qid, i + 1, doc,
            BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, nh)
        }
    }.sortBy(r => (r._1, r._2))
    val batch = graft.queries.LexIndex.serve(spark, Seq(idx), Seq(tomb)).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
      .toSeq
    assert(top == batch, s"stream+cut:\n$top\ntombstoned batch serve:\n$batch")
  }

  test("adcScore vector-query stream over the frozen PQ index equals q79's serve") {
    implicit val sqlCtx = spark.sqlContext
    val batch = SparkEntry.queries("q79_pq_index_search")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val idx = graft.queries.Similarity.pqIndexPath(spark, sfDir) // q79 just built it
    val qvecs = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 8).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[Streams.VecQuery]
    val query = Streams.adcScore(mem.toDS(),
        spark.read.parquet(s"$idx/codebook"), spark.read.parquet(s"$idx/codes"),
        excludeSelf = true) // fixture qids ARE corpus vec_ids (q79 geometry)
      .writeStream.format("memory").queryName("adc_stream")
      .outputMode("append").start()
    mem.addData(qvecs.map { case (qid, v) =>
      Streams.VecQuery(qid, ts("2024-01-01 01:00:00"), v) }.toIndexedSeq: _*)
    query.processAllAvailable()
    // close the window: a later query advances the watermark
    mem.addData(Streams.VecQuery(999999L, ts("2024-01-10 00:00:00"),
      qvecs.head._2))
    query.processAllAvailable()
    val streamed = spark.table("adc_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    query.stop()
    assert(streamed.nonEmpty && streamed.forall(_._1 != 999999L))
    // serveAdc's exact consumer cut: adist asc, vec_id tiebreak, depth 3
    val top = streamed.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy { case (_, vec, d) => (d, vec) }.take(3).zipWithIndex
        .map { case ((_, vec, d), i) => (qid, vec, d, i + 1) }
    }.sortBy(r => (r._1, r._4))
    assert(top == batch, s"stream+cut:\n$top\nbatch q79:\n$batch")
  }

  test("adcScore honors a takedown: the tombstone-masked stream equals the tombstoned batch arm") {
    // the vector twin of the lexScore takedown test — both ONLINE arms
    // now provably honor the same removal list the batch arms do (the
    // q136/q138 contract): the caller passes the anti-joined codes, and
    // the stream's cut must equal adcRanks over the same tombstone
    implicit val sqlCtx = spark.sqlContext
    graft.queries.Similarity.queries("q79_pq_index_search")(spark, sfDir).collect()
    val idx = graft.queries.Similarity.pqIndexPath(spark, sfDir)
    val tomb = graft.queries.Similarity.fullPqTombstone(spark, sfDir)
    val removed = spark.read.parquet(s"$tomb/ids").collect().map(_.getLong(0)).toSet
    assert(removed.nonEmpty, "fixture request removed nothing — test is vacuous")
    val codes = spark.read.parquet(s"$idx/codes")
      .join(broadcast(spark.read.parquet(s"$tomb/ids")), Seq("vec_id"), "left_anti")
    val qvecs = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 8).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[Streams.VecQuery]
    val query = Streams.adcScore(mem.toDS(),
        spark.read.parquet(s"$idx/codebook"), codes,
        excludeSelf = true) // fixture qids ARE corpus vec_ids (q79 geometry)
      .writeStream.format("memory").queryName("adc_tomb_stream")
      .outputMode("append").start()
    mem.addData(qvecs.map { case (qid, v) =>
      Streams.VecQuery(qid, ts("2024-01-01 01:00:00"), v) }.toIndexedSeq: _*)
    query.processAllAvailable()
    mem.addData(Streams.VecQuery(999999L, ts("2024-01-10 00:00:00"), qvecs.head._2))
    query.processAllAvailable()
    val streamed = spark.table("adc_tomb_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    query.stop()
    assert(streamed.nonEmpty && streamed.forall(r => !removed(r._2)),
      "a removed vec_id surfaced in the takedown-masked stream")
    val top = streamed.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy { case (_, vec, d) => (d, vec) }.take(3).zipWithIndex
        .map { case ((_, vec, _), i) => (qid.toInt, vec, i + 1) }
    }.sortBy(r => (r._1, r._3))
    val batch = graft.queries.Similarity
      .adcRanks(spark, sfDir, (0 until 8), 3, Seq(tomb)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq
      .sortBy(r => (r._1, r._3))
    assert(top == batch, s"stream+cut:\n$top\ntombstoned batch arm:\n$batch")
  }

  test("adcScore external queries: a qid colliding with a stored vec_id is NOT dropped by default") {
    // external query streams have a qid space unrelated to vec_ids — an
    // id collision must not silently remove that stored vector from the
    // query's scoring (the exclusion is the q79 fixture's, opt-in only)
    implicit val sqlCtx = spark.sqlContext
    graft.queries.Similarity.queries("q79_pq_index_search")(spark, sfDir).collect()
    val idx = graft.queries.Similarity.pqIndexPath(spark, sfDir)
    val nVecs = spark.read.parquet(s"$idx/codes")
      .select("vec_id").distinct().count()
    val emb = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
    val mem = MemoryStream[Streams.VecQuery]
    // qid 0 collides with stored vec_id 0 by construction
    val query = Streams.adcScore(mem.toDS(),
        spark.read.parquet(s"$idx/codebook"), spark.read.parquet(s"$idx/codes"))
      .writeStream.format("memory").queryName("adc_ext_stream")
      .outputMode("append").start()
    mem.addData(Streams.VecQuery(0L, ts("2024-01-01 01:00:00"), emb))
    query.processAllAvailable()
    mem.addData(Streams.VecQuery(999999L, ts("2024-01-10 00:00:00"), emb))
    query.processAllAvailable()
    val streamed = spark.table("adc_ext_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    query.stop()
    val scoredForQ0 = streamed.filter(_._1 == 0L)
    assert(scoredForQ0.map(_._2).contains(0L),
      "external default dropped the vec_id == qid vector")
    assert(scoredForQ0.size.toLong == nVecs,
      s"external default scored ${scoredForQ0.size} of $nVecs stored vectors")
  }

  test("phraseScore query stream over the frozen positional index equals q155's serve") {
    implicit val sqlCtx = spark.sqlContext
    val idx = graft.queries.LexIndex.buildPhraseIndex(spark, sfDir)
    val mem = MemoryStream[Streams.PhraseQuery]
    val query = Streams.phraseScore(mem.toDS(),
        spark.read.parquet(s"$idx/positions"))
      .writeStream.format("memory").queryName("phrase_stream")
      .outputMode("append").start()
    mem.addData(graft.queries.LexIndex.PhraseQueries.map { case (qid, txt) =>
      Streams.PhraseQuery(qid, ts("2024-01-01 01:00:00"), txt) }: _*)
    query.processAllAvailable()
    // at-least-once delivery: the SAME query events arrive again; the
    // vote dedup must absorb them or every n_matched doubles and all
    // true matches vanish (the r15 ADVICE scenario)
    mem.addData(graft.queries.LexIndex.PhraseQueries.map { case (qid, txt) =>
      Streams.PhraseQuery(qid, ts("2024-01-01 01:00:00"), txt) }: _*)
    query.processAllAvailable()
    // a later query advances the watermark past the workload's window
    mem.addData(Streams.PhraseQuery(999, ts("2024-01-10 00:00:00"), "zzz_unmatched"))
    query.processAllAvailable()
    val streamed = spark.table("phrase_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).filter(_._1 != 999).toSeq
    query.stop()
    // the consumer's bounded rollup: occurrence counts per (qid, doc),
    // q155's exact ranking contract (n_occ desc, doc_id, depth 5)
    val top = streamed.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((qid, doc), occ) => (qid, doc, occ.size.toLong) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
          .map { case ((q, d, n), i) => (q, i + 1, d, n) }
      }.sortBy(r => (r._1, r._2))
    val batch = SparkEntry.queries("q155_phrase_index")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(top == batch,
      s"stream phrase serve differs from q155:\n top=$top\nbatch=$batch")
    assert(streamed.nonEmpty, "stream matched nothing — vacuous")
  }

  test("oovMonitor stream rollup equals q152's batch drift rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the q152 fixture geometry: frozen corpus vocabulary {a, b, c},
    // intake shard with planted novel types per language
    val dir = java.nio.file.Files.createTempDirectory("graft_oov_stream").toFile
    dir.deleteOnExit()
    Seq(
      (0L, "a b a c", "en", "s"), (1L, "b c b", "de", "s"), (2L, "a a", "en", "s"),
      (4L, "a x x y", "en", "s"), (9L, "b b z", "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val batch = SparkEntry.queries("q152_oov_drift")(spark, dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), if (r.isNullAt(6)) -1L else r.getLong(6))).toSeq
    // frozen vocabulary: the corpus generation's type set, batch-side
    val vocab = spark.read.parquet(s"${dir.getAbsolutePath}/documents.parquet")
      .filter(col("doc_id") % 5 =!= 4)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0).distinct()
    val mem = MemoryStream[Streams.LangDoc]
    val query = Streams.oovMonitor(mem.toDS(), vocab)
      .writeStream.format("memory").queryName("oov_stream")
      .outputMode("append").start()
    mem.addData(
      Streams.LangDoc(4L, ts("2024-01-01 01:00:00"), "en", "a x x y"),
      Streams.LangDoc(9L, ts("2024-01-01 02:00:00"), "de", "b b z"))
    query.processAllAvailable()
    // a later doc advances the watermark past the fixture's window
    mem.addData(Streams.LangDoc(999L, ts("2024-01-10 00:00:00"), "xx", "w"))
    query.processAllAvailable()
    val typed = spark.table("oov_stream").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4)))
      .filter(_._2 != "xx")
    query.stop()
    // the relation carries its window (r15 ADVICE): the fixture spans
    // one day, so exactly one distinct win_start survives the filter —
    // a multi-day consumer would key the rollup per (win_start, lang)
    assert(typed.map(_._1).distinct.length == 1,
      s"expected one window, got ${typed.map(_._1).distinct.toSeq}")
    // the consumer's bounded rollup over the emitted type relation —
    // q152's exact report shape, keyed per (window, lang)
    val rolled = typed.groupBy(r => (r._1, r._2)).toSeq.map { case ((_, lang), rows) =>
      val oov = rows.filter(_._5)
      (lang, rows.map(_._4).sum, oov.map(_._4).sum,
        1000000L * oov.map(_._4).sum / rows.map(_._4).sum,
        rows.size.toLong, oov.size.toLong,
        if (oov.isEmpty) -1L else oov.map(_._4).max)
    }.sortBy(_._1)
    assert(rolled == batch,
      s"stream rollup differs from batch drift:\n $rolled\n $batch")
    // non-vacuous: the stream really saw OOV types
    assert(typed.count(_._5) >= 3)
  }

  test("embedDrift stream rollup equals q158's batch drift rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // q158's slice geometry: corpus = vec_id % 5 != 4, intake = % 5 = 4
    val dir = java.nio.file.Files.createTempDirectory("graft_embed_drift").toFile
    dir.deleteOnExit()
    val vecs = Seq(
      (1L, "x", Seq(0.1f, 0.2f, 0.0f)), (2L, "x", Seq(0.3f, 0.0f, 0.1f)),
      (3L, "y", Seq(1.0f, 1.0f, 1.0f)), (6L, "y", Seq(0.8f, 1.2f, 1.0f)),
      (4L, "x", Seq(0.5f, 0.5f, 0.5f)), (9L, "x", Seq(0.1f, 0.3f, 0.2f)),
      (14L, "y", Seq(1.5f, 0.5f, 1.1f)))
    vecs.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
    val batch = SparkEntry.queries("q158_embedding_drift")(spark, dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // the frozen corpus-generation centroid relation, batch-side
    val frozen = spark.read.parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
      .filter(col("vec_id") % 5 =!= 4)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("label"), (col("pos0") + 1).as("pos"),
        round(col("v").cast("double") * 10000.0).cast("long").as("q"))
      .groupBy("label", "pos")
      .agg(expr("sum(q) div count(1)").as("cc"), count(lit(1)).as("nc"))
    val mem = MemoryStream[Streams.EmbedDoc]
    val query = Streams.embedDrift(mem.toDS(), frozen)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("append").start()
    mem.addData(vecs.filter(_._1 % 5 == 4).map { case (id, lab, e) =>
      Streams.EmbedDoc(id, ts("2024-01-01 01:00:00"), lab, e) }: _*)
    query.processAllAvailable()
    mem.addData(Streams.EmbedDoc(999L, ts("2024-01-10 00:00:00"), "zz", Seq(0f, 0f, 0f)))
    query.processAllAvailable()
    val dims = spark.table("drift_stream").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).filter(_._1 != "zz")
    query.stop()
    // the consumer's bounded per-label rollup — q158's exact report
    val rolled = dims.groupBy(_._1).toSeq.map { case (lab, rows) =>
      (lab, rows.map(_._6).max, rows.map(_._4).max,
        rows.map(r => (r._5 - r._3) * (r._5 - r._3)).sum,
        rows.map(r => math.abs(r._5 - r._3)).max)
    }.sortBy(_._1)
    assert(rolled == batch,
      s"stream drift rollup differs from q158:\n $rolled\n $batch")
    assert(dims.nonEmpty)
  }

  test("unigramEncode stream rows equal q164's batch encode under the same frozen vocabulary") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram_stream").toFile
    dir.deleteOnExit()
    val rows = Seq(
      (0L, "low low low low low lower lower", "en", "s"),
      (3L, "newest newest newest newest newest newest", "en", "s"),
      (6L, "widest widest widest", "en", "s"),
      (10L, "lowest newest widest unseen", "en", "s"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val batch = SparkEntry.queries("q164_unigram_encode")(spark, dir.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // the SAME frozen vocabulary q164 trains (the doc_id % 3 = 0 sample)
    val types = spark.read.parquet(s"${dir.getAbsolutePath}/documents.parquet")
      .filter(col("doc_id") % 3 === 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val vocab = graft.functions.Unigram.train(spark, types)
    val mem = MemoryStream[Streams.Doc]
    val query = Streams.unigramEncode(mem.toDS(), vocab)
      .writeStream.format("memory").queryName("uni_stream")
      .outputMode("append").start()
    mem.addData(rows.map { case (id, txt, _, _) =>
      Streams.Doc(id, ts("2024-01-01 01:00:00"), txt) }: _*)
    query.processAllAvailable()
    val streamed = spark.table("uni_stream").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).sortBy(_._1).toSeq
    query.stop()
    assert(streamed == batch,
      s"stream encode differs from q164 batch:\n $streamed\n $batch")
    graft.Caches.release()
  }
}
