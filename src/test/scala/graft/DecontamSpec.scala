package graft

import org.apache.spark.sql.functions._

/** q165 (embedding-space decontamination) semantics the oracle hash
  * cannot articulate: the PARAPHRASE arm and the VERBATIM arm (q161)
  * catch disjoint leak classes. One fixture, two leaks:
  *  - doc 1 paraphrases eval doc 5 — embedding nearly parallel, text
  *    sharing no 8-token window → q165 flags it, q161 strips nothing;
  *  - doc 2 quotes eval doc 5 verbatim — 8-token window shared, but
  *    its embedding is orthogonal to the eval slice → q161 strips the
  *    span, q165 stays silent.
  * (Eval slice convention: id % 17 = 5 on both tables — q51's.) */
class DecontamSpec extends SparkTestBase {

  import spark.implicits._

  test("embedding decontamination flags the paraphrase the verbatim strip misses, and vice versa") {
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam").toString
    val dim = 8
    def vec(axis: Int, v: Float) = { val a = Array.fill(dim)(0f); a(axis) = v; a.toSeq }
    // vec 5 = eval; vec 1 = paraphrase of it (same direction, scaled —
    // identical hyperplane signs, cosine exactly 1.0); vec 2 = verbatim
    // quoter but semantically orthogonal (different axis)
    Seq(
      (1L, vec(0, 0.9f), "x"),
      (2L, vec(1, 1.0f), "x"),
      (5L, vec(0, 1.0f), "x"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val evalText = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    Seq(
      (1L, "alpha beta gamma", "en", "s"),           // < 8 tokens: no window
      (2L, "intro t1 t2 t3 t4 t5 t6 t7 t8 outro", "en", "s"), // 8-token quote
      (5L, evalText, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val sem = SparkEntry.queries("q165_embed_decontam")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSeq
      // exactly the paraphrase, attributed to its eval neighbor
      assert(sem == Seq((1L, 1, 1.0, 5L)),
        s"semantic arm expected only the paraphrase (1 → 5): $sem")
      graft.Caches.release()
      val verb = SparkEntry.queries("q161_decontam_strip")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(2))).toMap // doc_id -> n_removed
      assert(verb(2L) >= 8, s"verbatim quote not stripped: $verb")
      assert(verb(1L) == 0, s"paraphrase wrongly stripped by the verbatim arm: $verb")
      assert(!verb.contains(5L), "eval doc modified by the strip")
      graft.Caches.release()
      // the composed release verdict routes each leak class to its
      // remedy: the paraphrase drops whole, the quote routes to the
      // span strip, and the eval doc is not judged
      val comp = SparkEntry.queries("q168_decontam_verdict")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getString(4))).toSeq
      assert(comp == Seq((1L, 0, true, "drop_semantic"), (2L, 8, false, "strip_spans")),
        s"composed verdict wrong: $comp")
    } finally graft.Caches.release()
  }
}
