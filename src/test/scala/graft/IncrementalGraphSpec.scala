package graft

import graft.queries.{IncrementalGraphAnn, Similarity}
import org.apache.spark.sql.functions._

/** The incremental graph-ANN family's contracts beyond the oracle's
  * value equality (q188/q189 are fully oracle-checked — the frozen-pivot
  * build keeps every step relationally replayable): the FROZEN coarse
  * layer, the additive adjacency algebra, the back-link reachability
  * guarantee, and the subtractive takedown. One build/stage/ingest per
  * suite run (marker-gated, shared by every test — the q84 spec
  * economy). */
class IncrementalGraphSpec extends SparkTestBase {

  private lazy val base = IncrementalGraphAnn.buildIndex(spark, sfDir)
  private lazy val gen = IncrementalGraphAnn.servingIndex(spark, sfDir)

  private def edges(path: String): Set[(Long, Long)] =
    spark.read.parquet(s"$path/adj").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ingest freezes the coarse layer: gen-1 pivots ≡ base pivots") {
    val p0 = spark.read.parquet(s"$base/pivots").select("cell").collect()
      .map(_.getLong(0)).sorted.toSeq
    val p1 = spark.read.parquet(s"$gen/pivots").select("cell").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(p0.nonEmpty, "no pivots — vacuous")
    assert(p1 == p0, s"ingest changed the frozen coarse layer: $p0 -> $p1")
  }

  test("adjacency is additive and back-linked: base ⊆ gen-1, every batch edge reversed") {
    val e0 = edges(base)
    val e1 = edges(gen)
    assert(e0.subsetOf(e1), s"ingest dropped base edges: ${(e0 -- e1).take(5)}")
    val batchIds = spark.read.parquet(s"${IncrementalGraphAnn.stageBatch(spark, sfDir)}/vecs")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(batchIds.nonEmpty, "no batch vectors — vacuous")
    val batchOut = e1.filter { case (s, _) => batchIds.contains(s) }
    assert(batchOut.nonEmpty, "batch nodes got no out-edges")
    batchOut.foreach { case (s, d) =>
      assert(e1.contains((d, s)),
        s"batch edge ($s,$d) has no back-link — new content unreachable")
    }
    // batch out-degree bounded by the build rule: a node's OWN edges are
    // ≤ probe × perCell = M, and its reversed back-links are bounded by
    // its measured in-degree from batch sources (in-degree is uncapped —
    // a popular batch vector can exceed any fixed multiple of M on a
    // regenerated fixture, so the bound must be per-node, not 2M)
    val outDeg = e1.toSeq.filter(e => batchIds.contains(e._1))
      .groupBy(_._1).view.mapValues(_.size).toMap
    val inFromBatch = e1.toSeq
      .filter(e => batchIds.contains(e._2) && batchIds.contains(e._1))
      .groupBy(_._2).view.mapValues(_.size).toMap
    outDeg.foreach { case (n, d) =>
      assert(d <= Similarity.GraphM + inFromBatch.getOrElse(n, 0),
        s"batch node $n out-degree $d exceeds M + its batch in-degree " +
          s"${inFromBatch.getOrElse(n, 0)} — the build rule leaked")
    }
  }

  test("serve reaches ingested content: batch ids appear in walk candidates") {
    // the back-links exist precisely so the walk can route INTO the
    // day's vectors from base entry points; assert non-vacuously that
    // the served frontier (or its top-k) can carry batch ids by walking
    // and checking the union of all served rows across queries
    val served = SparkEntry.queries("q188_gann_intake")(spark, sfDir).collect()
    Caches.release()
    assert(served.length == 24, s"expected 8×3 served rows, got ${served.length}")
    val ids = served.map(_.getLong(1)).toSet
    val batchIds = spark.read.parquet(s"${IncrementalGraphAnn.stageBatch(spark, sfDir)}/vecs")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // at fixture scale batch vectors land in top-3 for at least one
    // query (1/5 of the corpus is batch); if this flakes on a fixture
    // regen, weaken to frontier membership before weakening further
    assert(ids.exists(batchIds.contains),
      "no batch vector reached any served top-k — back-links not navigable")
  }

  test("window serve: batched relational walk ≡ driver walk over the artifact") {
    // the family's Q-gate (the measured GraphDriverWalkMaxQ crossover)
    // is a physical-plan decision only: both arms must serve the same
    // rows over the SAME artifact relations, tombstones included
    val qP = IncrementalGraphAnn.stageQueries(spark, sfDir)
    def rows(b: Boolean): Seq[String] =
      IncrementalGraphAnn.windowServe(spark, Seq(gen), qP, Nil, Some(b))
        .collect().map(_.toString).toSeq
    val driver = rows(false)
    val batched = rows(true)
    Caches.release()
    assert(driver.nonEmpty)
    assert(batched == driver, s"walk arms diverged on the artifact serve")
  }

  test("retention window: only live-era vectors serve; the retired-era audit is non-vacuous") {
    val rows = SparkEntry.queries("q190_gann_retention")(spark, sfDir).collect()
    Caches.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getLong(1)
      assert(v % 5 != 4 && v % 2 == 1,
        s"retired or un-ingested vector $v served from the live window")
    }
    // the audit bit must price a REAL recall cost on the parity split:
    // with half the corpus retired, some served row has a strictly
    // better retired neighbor, and not all do (else the bit is a
    // constant, not a measurement)
    val bits = rows.map(_.getBoolean(4)).toSet
    assert(bits == Set(true, false),
      s"retired_better is constant ($bits) — the audit is vacuous on this fixture")
  }

  // the suite's compacted artifact: publish() is marker-gated, so each
  // test that needs it can call this independently — whichever runs
  // first builds, the rest no-op (no inter-test ordering dependency)
  private def compactedIndex(): String =
    IncrementalGraphAnn.compact(spark, gen,
      Seq(IncrementalGraphAnn.takedown(spark,
        spark.read.parquet(s"$gen/vectors").select(col("vec_id").as("doc_id"))
          .filter(col("doc_id") % 7 === 3),
        gen, IncrementalGraphAnn.tombBase(spark, sfDir))),
      IncrementalGraphAnn.compPath(spark, sfDir))

  test("compaction folds the tombstone physically; members reassigned to surviving cells") {
    val comp = compactedIndex()
    for ((rel, cols) <- Seq("vectors" -> Seq("vec_id"), "members" -> Seq("vec_id"),
                            "adj" -> Seq("src", "dst"), "pivots" -> Seq("cell"))) {
      val hit = cols.map(c =>
        spark.read.parquet(s"$comp/$rel").filter(col(c) % 7 === 3).count()).sum
      assert(hit == 0, s"compacted $rel still holds $hit tombstoned rows")
    }
    // every surviving vector keeps a members row, and every members row
    // references a SURVIVING cell — orphans of retired cells were
    // reassigned, so future ingests draw from the full survivor pool
    val cells = spark.read.parquet(s"$comp/pivots").select("cell")
      .collect().map(_.getLong(0)).toSet
    val members = spark.read.parquet(s"$comp/members").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(members.forall(m => cells.contains(m._2)),
      s"members reference retired cells: ${members.filterNot(m => cells.contains(m._2)).take(5)}")
    val vecIds = spark.read.parquet(s"$comp/vectors").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(members.map(_._1).toSet == vecIds,
      "compaction lost (or invented) member rows for surviving vectors")
    Caches.release()
  }

  test("compacted entry frontier contains the masked one (rank-after-drop contract)") {
    // the q191 contract: a compacted index ranks entries over SURVIVING
    // pivots, recovering the entry budget the masked serve loses — a
    // surviving cell's crank only improves when the pool shrinks, so
    // masked-f0 ⊆ compacted-f0 must hold structurally, per query
    val comp = compactedIndex() // marker-gated: builds if this test runs first
    val qP = IncrementalGraphAnn.stageQueries(spark, sfDir)
    val qvecs = spark.read.parquet(s"$qP/vecs")
      .select(col("vec_id").as("qid"), col("qa").as("qq"), col("n2").as("n2q"))
    def f0(pivots: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      qvecs.crossJoin(broadcast(pivots))
        .withColumn("dot", expr("graft_dot(qq, pa)"))
        .withColumn("cos", Similarity.cosine(col("dot"), col("n2q"), col("pn2")))
        .withColumn("crank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("cell"))))
        .filter(col("crank") <= Similarity.GraphEntries && col("qid") =!= col("cell"))
        .select("qid", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val genPiv = spark.read.parquet(s"$gen/pivots")
    val full = f0(genPiv) // rank over ALL pivots (q189's frontier, pre-drop)
    val masked = full.filter(_._2 % 7 != 3) // then drop (q189)
    val compacted = f0(spark.read.parquet(s"$comp/pivots")) // rank over survivors (q191)
    val survCells = spark.read.parquet(s"$comp/pivots").select("cell")
      .collect().map(_.getLong(0)).toSet
    Caches.release()
    assert(masked.nonEmpty && compacted.nonEmpty)
    assert(masked.subsetOf(compacted),
      s"masked f0 escaped the compacted f0: ${(masked -- compacted).take(5)}")
    // the recovered entry budget must be real exactly when the premise
    // holds: some query LOST an entry slot to the tombstone (a retired
    // cell sat in its top-GraphEntries over all pivots) AND that query
    // has more surviving candidate cells than the budget (excluding
    // itself — a query that is a pivot never enters its own frontier).
    // Gating on the observed frontier, not on fixture arithmetic, keeps
    // the assert valid across fixture regens where no tombstone happens
    // to land in an entry slot (the serve is then correct and the sets
    // legitimately tie)
    val recoverable = full.filter(_._2 % 7 == 3).map(_._1).exists(q =>
      survCells.size - (if (survCells.contains(q)) 1 else 0) > Similarity.GraphEntries)
    if (recoverable)
      assert((compacted -- masked).nonEmpty,
        "a query lost an entry slot to the tombstone and the budget binds, " +
          "but compaction recovered no entry slot")
  }

  test("takedown is subtractive: no tombstoned id is served, cited, or relayed") {
    val out = SparkEntry.queries("q189_gann_takedown")(spark, sfDir).collect()
    Caches.release()
    assert(out.nonEmpty)
    assert(!out.exists(_.getLong(1) % 7 == 3),
      "a tombstoned vector survived in the served top-k")
    // the serve under an EMPTY tombstone set equals q188 exactly — the
    // filters are no-ops, not approximations
    val t0 = IncrementalGraphAnn.serve(spark, gen,
      IncrementalGraphAnn.stageQueries(spark, sfDir), Nil).collect().map(_.toString).sorted.toSeq
    val plain = SparkEntry.queries("q188_gann_intake")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    Caches.release()
    assert(t0 == plain, "tomb-free serve diverged from q188")
  }
}
