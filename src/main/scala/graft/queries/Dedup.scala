package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Document deduplication for large-scale training-data pipelines, over the
  * `documents` table: exact (hash-groupBy), n-gram Jaccard, MinHash+LSH
  * (banded), and SimHash. Beyond the reference's own operator set (its A4
  * dedup is `dropDuplicates`); these are the scale-path versions a 100 TB
  * corpus needs.
  *
  * Scale stance:
  *  - NOTHING here is all-pairs over the corpus. Candidate generation is
  *    always an equi-join on a derived key (text hash, shared shingle,
  *    LSH band, SimHash band) — Spark shuffles on that key and each bucket
  *    is small; exact Jaccard is computed only for candidates.
  *  - The shingle→pair join (q32) is the textbook approach whose hot keys
  *    (stopword shingles) explode quadratically at corpus scale; it is
  *    kept as the exact baseline, and q33's banded MinHash-LSH is the
  *    production path: O(docs × bands) join keys, candidate count
  *    proportional to true near-dup count, tunable via (hashes, bands).
  *  - All hashing is md5 (cross-engine reproducible, so the DuckDB oracle
  *    can replay it exactly): the MinHash signature is the lexicographic
  *    MIN of md5(seed:shingle) hex strings per seed — a valid uniform
  *    permutation family — and band keys are md5 over the band's
  *    signature slice.
  */
object Dedup extends QueryModule {

  /** Distinct word-2gram shingles per doc: (doc_id, shingle). */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))")
      ).as("shingle"))
      .distinct()
  }

  private val shinglesSqlCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |sh AS (SELECT DISTINCT doc_id, unnest([ts[i] || ' ' || ts[i + 1] for i in range(1, len(ts))]) AS shingle FROM toks)""".stripMargin

  // ---------------------------------------------------------------------
  // q31 — exact dedup by content hash. The input simulates a re-ingested
  // batch (the corpus unioned with a fifth of itself): group by md5(text),
  // keep the minimum doc_id as canonical, count copies. One shuffle on the
  // hash; at 100 TB this is the standard first pass before any fuzzy
  // matching, and the hash key is uniform so there is no skew.
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val reingested = docs.unionByName(docs.filter(col("doc_id") % 5 === 0))
    reingested
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
           count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy("canonical_doc_id")
  }

  private val q31Sql =
    """WITH reingested AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0)
      |SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_copies
      |FROM reingested GROUP BY md5(text) HAVING COUNT(*) > 1
      |ORDER BY canonical_doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q32 — n-gram Jaccard near-dup, exact baseline: candidate pairs share
  // at least one shingle (equi-join on shingle, never a cross join), then
  // Jaccard = |∩| / (n1 + n2 − |∩|) ≥ 0.8. Finds the corpus's planted
  // near-duplicate pairs. Runs on a deterministic 1/2 stratum (even
  // doc_id): the shingle-pair join is inherently ~quadratic in docs per
  // shingle — this is the EXACT baseline kept for verification; the
  // full-corpus path is q33's banded LSH.
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir).filter(col("doc_id") % 2 === 0).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("jaccard", round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= 0.8)
      .select("d1", "d2", "inter", "n1", "n2", "jaccard")
      .orderBy("d1", "d2")
  }

  private val q32Sql =
    s"""WITH $shinglesSqlCte,
      |sh2 AS (SELECT * FROM sh WHERE doc_id % 2 = 0),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
      |  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.d1, p.d2, p.inter, s1.n AS n1, s2.n AS n2,
      |       ROUND(CAST(p.inter AS DOUBLE) / (s1.n + s2.n - p.inter), 6) AS jaccard
      |FROM pairs p JOIN sizes s1 ON p.d1 = s1.doc_id JOIN sizes s2 ON p.d2 = s2.doc_id
      |WHERE ROUND(CAST(p.inter AS DOUBLE) / (s1.n + s2.n - p.inter), 6) >= 0.8
      |ORDER BY p.d1, p.d2""".stripMargin

  // ---------------------------------------------------------------------
  // q33 — MinHash + banded LSH, the scale path: 16 minhashes per doc
  // (lexicographic min over shingles of 32-bit words sliced from
  // md5(band:shingle)), 4 bands of 4 rows; docs sharing any band key
  // become candidates; candidates are then verified with exact Jaccard.
  // Join keys are (band, bandkey) — uniform md5 values, so the shuffle
  // is skew-free, and the candidate set is ~the true near-dup set rather
  // than all shingle-sharing pairs (at sf0.01: ~25 candidates vs 104k
  // shingle-sharing pairs — a 4000× cut).
  private val NumHashes = 16
  private val BandSize = 4

  /** Verified near-dup pairs (d1, d2, jaccard) — q33's body, reused by
    * the corpus filter (q44). */
  def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    // Signature: one md5 per (shingle, band) yields FOUR independent
    // 32-bit hash words (disjoint bit ranges of the digest — the
    // standard way to amortize hashing), so 16 minhashes cost 4 md5
    // calls per shingle, not 16. Flat codegen'd pipeline, one skew-free
    // partial-aggregated shuffle on (doc_id, band) with 4 MIN columns.
    // The shingle SET also travels as an array column so exact
    // verification of a candidate pair is array_intersect on the two
    // candidate rows, not a third shingle-level join.
    val docSh = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 2)
      .withColumn("sh", expr(
        "array_distinct(transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1))))"))
      .select(col("doc_id"), col("sh"))
      .cache() // used three times: signature explode + both verification sides
    val nBands = NumHashes / BandSize
    val groups = s.range(nBands).select(col("id").cast("int").as("band"))
    val bands = docSh.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .crossJoin(broadcast(groups))
      .withColumn("h", md5(concat(col("band").cast("string"), lit(":"), col("shingle"))))
      .groupBy("doc_id", "band")
      .agg(min(substring(col("h"), 1, 8)).as("w0"),
           min(substring(col("h"), 9, 8)).as("w1"),
           min(substring(col("h"), 17, 8)).as("w2"),
           min(substring(col("h"), 25, 8)).as("w3"))
      .select(col("doc_id"), col("band"),
        md5(concat_ws("|", col("w0"), col("w1"), col("w2"), col("w3"))).as("bandkey"))
    // Bucket docs by (band, bandkey) and emit in-bucket pairs with array
    // combinatorics — the signature pipeline runs ONCE (no self-join that
    // would recompute it per side) and the pair blowup is bounded by the
    // bucket sizes, which banded minhash keeps tiny by construction.
    val cand = bands
      .groupBy("band", "bandkey")
      .agg(expr("array_sort(collect_list(doc_id)) AS ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1), i ->
          |  transform(slice(ids, i + 1, size(ids) - i), y ->
          |    struct(element_at(ids, i) AS d1, y AS d2))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
    // no broadcast hint: the shingle-array relation is corpus-sized and a
    // forced broadcast would hit the 8 GB limit / driver OOM at scale —
    // Catalyst/AQE broadcasts it automatically while it is small
    cand
      .join(docSh.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
      .join(docSh.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", round(col("inter").cast("double")
        / (size(col("sh1")) + size(col("sh2")) - col("inter")), 6))
      .select("d1", "d2", "jaccard")
  }

  private def q33(s: SparkSession, dir: String): DataFrame =
    minhashPairs(s, dir).orderBy("d1", "d2")

  private val q33Sql =
    s"""WITH $shinglesSqlCte,
      |grps AS (SELECT CAST(unnest(range(${NumHashes / BandSize})) AS INT) AS band),
      |sig AS (
      |  SELECT doc_id, band,
      |         MIN(substring(md5(band::VARCHAR || ':' || shingle), 1, 8)) AS w0,
      |         MIN(substring(md5(band::VARCHAR || ':' || shingle), 9, 8)) AS w1,
      |         MIN(substring(md5(band::VARCHAR || ':' || shingle), 17, 8)) AS w2,
      |         MIN(substring(md5(band::VARCHAR || ':' || shingle), 25, 8)) AS w3
      |  FROM sh CROSS JOIN grps GROUP BY doc_id, band),
      |bands AS (
      |  SELECT doc_id, band, md5(w0 || '|' || w1 || '|' || w2 || '|' || w3) AS bandkey
      |  FROM sig),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.bandkey = b.bandkey AND a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT c.d1, c.d2, COUNT(*) AS inter
      |  FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND a.shingle = b.shingle
      |  GROUP BY c.d1, c.d2)
      |SELECT c.d1, c.d2,
      |       ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE) / (s1.n + s2.n - COALESCE(i.inter, 0)), 6) AS jaccard
      |FROM cand c LEFT JOIN inter i ON c.d1 = i.d1 AND c.d2 = i.d2
      |JOIN sizes s1 ON c.d1 = s1.doc_id JOIN sizes s2 ON c.d2 = s2.doc_id
      |ORDER BY c.d1, c.d2""".stripMargin

  // ---------------------------------------------------------------------
  // q34 — SimHash document fingerprints: 32-bit signature from
  // term-frequency-weighted md5 token bits. Per (doc, bit) the sign of
  // Σ_tokens cnt·(2·bit − 1) decides the signature bit — integer sums,
  // fully deterministic and engine-portable. Work is minimized by
  // aggregating token FREQUENCIES first (one md5 per distinct (doc,
  // token), not per occurrence×bit), then fanning out the 32 bit
  // positions with a broadcast join — flat codegen'd expressions, no
  // interpreted higher-order functions in the hot path.
  /** Unsorted simhash frame shared by q34 (adds the output sort) and q35
    * (bands + self-join). */
  private def simhashDf(s: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("tok")))
    val bits = tc
      .crossJoin(broadcast(s.range(32).select(col("id").cast("int").as("b"))))
      .withColumn("nib", expr("instr('0123456789abcdef', substring(h, (b div 4) + 1, 1)) - 1"))
      .withColumn("bit", expr("(nib div element_at(array(8, 4, 2, 1), (b % 4) + 1)) % 2"))
    bits.groupBy("doc_id", "b")
      .agg(sum(col("cnt") * (col("bit") * 2 - 1)).as("sgn"))
      .withColumn("sbit", when(col("sgn") >= 0, lit("1")).otherwise(lit("0")))
      .groupBy("doc_id")
      .agg(expr("concat_ws('', transform(array_sort(collect_list(struct(b, sbit))), x -> x.sbit)) AS simhash"))
  }

  private def q34(s: SparkSession, dir: String): DataFrame =
    simhashDf(s, dir).orderBy("doc_id")

  private val q34Sql =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |bits AS (
      |  SELECT doc_id, b,
      |         ((strpos('0123456789abcdef', substring(md5(tok), CAST(b // 4 AS INT) + 1, 1)) - 1)
      |            // [8, 4, 2, 1][(b % 4) + 1]) % 2 AS bit
      |  FROM toks CROSS JOIN (SELECT unnest(range(32)) AS b)),
      |sgns AS (
      |  SELECT doc_id, b, SUM(bit * 2 - 1) AS sgn FROM bits GROUP BY doc_id, b)
      |SELECT doc_id,
      |       string_agg(CASE WHEN sgn >= 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
      |FROM sgns GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q35 — SimHash near-dup candidates: band the 32 bits into 4 bytes,
  // join on (band, nibble) — again an equi-join, no all-pairs — and keep
  // pairs within Hamming distance 1 (computed per candidate pair only).
  private def q35(s: SparkSession, dir: String): DataFrame = {
    // 2 bands of 16 bits: by pigeonhole, any pair within Hamming distance
    // 1 has at least one identical half — full recall with far fewer
    // band-key collisions than narrower bands (16-bit keys ≈ 65k values
    // vs 256 for 8-bit, which collided quadratically on this
    // shared-vocabulary corpus). Pairs come from in-bucket combinatorics
    // (signature computed once, no self-join recompute).
    val sh = simhashDf(s, dir)
    val buckets = sh.select(col("doc_id"), col("simhash"),
        explode(expr("transform(sequence(0, 1), b -> struct(b AS band, substring(simhash, b * 16 + 1, 16) AS bk))")).as("x"))
      .select(col("doc_id"), col("simhash"), col("x.band").as("band"), col("x.bk").as("bk"))
      .groupBy("band", "bk")
      .agg(expr("array_sort(collect_list(struct(doc_id, simhash))) AS mem"))
      .filter(size(col("mem")) >= 2)
    buckets
      .select(explode(expr(
        """flatten(transform(sequence(1, size(mem) - 1), i ->
          |  transform(slice(mem, i + 1, size(mem) - i), y ->
          |    struct(element_at(mem, i).doc_id AS d1, element_at(mem, i).simhash AS h1,
          |           y.doc_id AS d2, y.simhash AS h2))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"), col("p.h1").as("h1"), col("p.h2").as("h2"))
      .distinct()
      // graft_hamming: native codegen'd Expression (plans.HammingDistance)
      // instead of an interpreted 32-iteration higher-order function
      .withColumn("hamming", expr("graft_hamming(h1, h2)"))
      .filter(col("hamming") <= 1)
      .select("d1", "d2", "hamming")
      .orderBy("d1", "d2")
  }

  private val q35Sql =
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |bits AS (
      |  SELECT doc_id, b,
      |         ((strpos('0123456789abcdef', substring(md5(tok), CAST(b // 4 AS INT) + 1, 1)) - 1)
      |            // [8, 4, 2, 1][(b % 4) + 1]) % 2 AS bit
      |  FROM toks CROSS JOIN (SELECT unnest(range(32)) AS b)),
      |sgns AS (SELECT doc_id, b, SUM(bit * 2 - 1) AS sgn FROM bits GROUP BY doc_id, b),
      |sh AS (
      |  SELECT doc_id, string_agg(CASE WHEN sgn >= 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
      |  FROM sgns GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, simhash, b AS band, substring(simhash, b * 16 + 1, 16) AS bk
      |  FROM sh CROSS JOIN (SELECT unnest(range(2)) AS b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS h1, b.simhash AS h2
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
      |SELECT d1, d2,
      |       len(list_filter([substring(h1, i, 1) != substring(h2, i, 1) for i in range(1, 33)], x -> x)) AS hamming
      |FROM cand
      |WHERE len(list_filter([substring(h1, i, 1) != substring(h2, i, 1) for i in range(1, 33)], x -> x)) <= 1
      |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------------
  // q44 — the corpus filter, the END ARTIFACT of the training-data
  // pipeline: compose quality scoring (q30's heuristics) with near-dup
  // removal (q33's verified MinHash pairs) into a keep/drop decision per
  // document with a reason code. Near-dup groups keep their lowest
  // doc_id (the canonical); quality is gated first, so a low-quality
  // canonical doesn't shield its duplicates. One narrow scoring pass +
  // the banded-LSH candidate join — the same plan shape a 100 TB corpus
  // sweep runs.
  private val QualityFloor = 0.5
  private val DupThreshold = 0.8

  private def q44(s: SparkSession, dir: String): DataFrame = {
    val quality = Tables.documents(s, dir)
      .withColumn("ts", split(col("text"), " "))
      .withColumn("n_tokens", size(col("ts")))
      .withColumn("n_stop", size(expr("filter(ts, t -> t IN ('the', 'a', 'is'))")))
      .withColumn("quality",
        round((lit(1.0) - col("n_stop").cast("double") / col("n_tokens"))
          * least(lit(1.0), col("n_tokens").cast("double") / 50.0), 6))
      .select("doc_id", "quality")
    val dupVictims = minhashPairs(s, dir)
      .filter(col("jaccard") >= DupThreshold)
      .select(col("d2").as("doc_id")) // keep the lowest id of each pair
      .distinct()
    quality
      .join(dupVictims.withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
      .withColumn("reason",
        when(col("quality") < QualityFloor, "low_quality")
          .when(col("is_dup"), "near_dup"))
      .select(col("doc_id"), col("quality"), col("reason").isNull.as("keep"), col("reason"))
      .orderBy("doc_id")
  }

  private val q44Sql =
    s"""WITH $shinglesSqlCte,
      |grps AS (SELECT CAST(unnest(range(${NumHashes / BandSize})) AS INT) AS band),
      |sig AS (
      |  SELECT doc_id, band,
      |         MIN(substring(md5(band::VARCHAR || ':' || shingle), 1, 8)) AS w0,
      |         MIN(substring(md5(band::VARCHAR || ':' || shingle), 9, 8)) AS w1,
      |         MIN(substring(md5(band::VARCHAR || ':' || shingle), 17, 8)) AS w2,
      |         MIN(substring(md5(band::VARCHAR || ':' || shingle), 25, 8)) AS w3
      |  FROM sh CROSS JOIN grps GROUP BY doc_id, band),
      |bands AS (
      |  SELECT doc_id, band, md5(w0 || '|' || w1 || '|' || w2 || '|' || w3) AS bandkey
      |  FROM sig),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.bandkey = b.bandkey AND a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT c.d1, c.d2, COUNT(*) AS inter
      |  FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND a.shingle = b.shingle
      |  GROUP BY c.d1, c.d2),
      |victims AS (
      |  SELECT DISTINCT c.d2 AS doc_id
      |  FROM cand c LEFT JOIN inter i ON c.d1 = i.d1 AND c.d2 = i.d2
      |  JOIN sizes s1 ON c.d1 = s1.doc_id JOIN sizes s2 ON c.d2 = s2.doc_id
      |  WHERE ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE) / (s1.n + s2.n - COALESCE(i.inter, 0)), 6) >= $DupThreshold),
      |quality AS (
      |  SELECT doc_id,
      |         ROUND((1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'is'))) AS DOUBLE)
      |                       / len(string_split(text, ' ')))
      |               * LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0), 6) AS quality
      |  FROM documents)
      |SELECT q.doc_id, q.quality,
      |       (CASE WHEN q.quality < $QualityFloor THEN 'low_quality'
      |             WHEN v.doc_id IS NOT NULL THEN 'near_dup' END) IS NULL AS keep,
      |       CASE WHEN q.quality < $QualityFloor THEN 'low_quality'
      |            WHEN v.doc_id IS NOT NULL THEN 'near_dup' END AS reason
      |FROM quality q LEFT JOIN victims v ON q.doc_id = v.doc_id
      |ORDER BY q.doc_id""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_exact_dedup"    -> (q31 _),
    "q32_ngram_jaccard"  -> (q32 _),
    "q33_minhash_lsh"    -> (q33 _),
    "q34_simhash"        -> (q34 _),
    "q35_simhash_pairs"  -> (q35 _),
    "q44_corpus_filter"  -> (q44 _),
  )

  override val oracle: Map[String, String] = Map(
    "q31_exact_dedup"    -> q31Sql,
    "q32_ngram_jaccard"  -> q32Sql,
    "q33_minhash_lsh"    -> q33Sql,
    "q34_simhash"        -> q34Sql,
    "q35_simhash_pairs"  -> q35Sql,
    "q44_corpus_filter"  -> q44Sql,
  )
}
