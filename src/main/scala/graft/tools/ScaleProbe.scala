package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe: replicate the documents corpus k× (doc_ids offset so
  * every copy is distinct — no artificial exact-dup collapse) and time
  * the heavy corpus operators at each factor. The point is the growth
  * CURVE, not the absolute numbers: a candidate-generation plan that is
  * secretly quadratic shows a 4× step between factors; the equi-join +
  * capped-bucket plans should step roughly linearly (plus the fixed
  * scheduler floor).
  *
  * Usage: runMain graft.tools.ScaleProbe [baseSfDir] [factors...]
  * Writes scaled corpora under /tmp/graft_scale/x<k>/ and prints one
  * JSON line per factor.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val queries = Seq("q31_exact_dedup", "q32_ngram_jaccard", "q33_minhash_lsh",
      "q44_corpus_filter", "q46_neardup_components", "q55_repetition",
      "q66_span_dedup", "q67_surprisal", "q72_curation_verdict")
    // embedding-side heavies: need a scaled embeddings table (vec_id
    // offset per copy; vectors unchanged — these ops generate no pairs,
    // so identical copies are not an artificial shortcut)
    val embQueries = Seq("q63_pq_codes", "q71_ivfpq_search")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = graft.Tables.documents(spark, base)
    val maxId = docs.agg(max("doc_id")).head.getLong(0) + 1
    val embs = graft.Tables.embeddings(spark, base)
    val maxVec = embs.agg(max("vec_id")).head.getLong(0) + 1

    factors.foreach { k =>
      val dir = s"/tmp/graft_scale/x$k"
      val scaled = (0 until k).map { i =>
        // offset ids AND perturb one token per copy so replicas are
        // near-dups of each other, not byte-identical texts — the
        // adversarial shape for candidate generation (exact-dup hashing
        // must NOT be what saves the fuzzy plans)
        docs.select((col("doc_id") + lit(i * maxId)).as("doc_id"),
          (if (i == 0) col("text")
           else concat(col("text"), lit(s" copymark$i"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val scaledEmb = (0 until k).map { i =>
        embs.select((col("vec_id") + lit(i * maxVec)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionByName _)
      scaledEmb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // warmup pass then timed pass, mirroring Bench methodology
      val times = (queries ++ embQueries).map { q =>
        val fn = graft.SparkEntry.queries(q)
        val ts = (1 to 2).map { _ =>
          graft.Caches.release(); spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        q -> ts.min
      }
      val qs = times.map { case (q, t) => s""""$q":${math.round(t * 1000) / 1000.0}""" }.mkString(",")
      println(s"""[scale] {"factor":$k,"docs":${maxId * k},$qs}""")
    }
    spark.stop()
  }
}
