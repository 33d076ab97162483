package graft

import org.apache.spark.sql.functions._

/** The native HammingDistance expression: correctness vs the composable
  * higher-order-function formulation, null semantics, codegen, and SQL
  * registration through GraftExtensions. */
class ExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private val hofHamming =
    "aggregate(transform(sequence(1, length(a)), i -> CASE WHEN substring(a, i, 1) = substring(b, i, 1) THEN 0 ELSE 1 END), 0, (acc, v) -> acc + v)"

  test("graft_hamming equals the HOF formulation on random bit strings") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      val n = 8 + rnd.nextInt(24)
      (Seq.fill(n)(if (rnd.nextBoolean()) '1' else '0').mkString,
       Seq.fill(n)(if (rnd.nextBoolean()) '1' else '0').mkString)
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", expr("graft_hamming(a, b)"))
      .withColumn("slow", expr(hofHamming))
    assert(df.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("null and length-mismatch semantics") {
    val df = Seq(("1010", "1010"), ("1010", "10"), (null, "1010"))
      .toDF("a", "b").selectExpr("graft_hamming(a, b) AS d")
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
      == Seq(0, null, null))
  }

  test("expression is available from spark.sql and stays in codegen") {
    val one = spark.sql("SELECT graft_hamming('abc', 'abd') AS d").collect()
    assert(one.head.getInt(0) == 1)
    // literal inputs fold into a LocalTableScan, so assert codegen on a
    // parquet-backed frame (the shape the expression actually serves)
    val plan = Tables.documents(spark, sfDir)
      .selectExpr("graft_hamming(md5(text), md5(lang)) AS d")
      .queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project") && plan.contains("graft_hamming"), plan)
  }

  test("graft_dot equals the zip_with/aggregate HOF on random long vectors") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200) {
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)(rnd.nextInt(2000001).toLong - 1000000L),
       Seq.fill(n)(rnd.nextInt(2000001).toLong - 1000000L))
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", expr("graft_dot(a, b)"))
      .withColumn("slow", expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    assert(df.filter(col("fast") =!= col("slow")).isEmpty)
    assert(df.filter(col("fast").isNull).isEmpty)
  }

  test("graft_dot null and length-mismatch semantics") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),   // 32
      (Seq(1L, 2L), Seq(1L, 2L, 3L)),       // mismatch -> null
      (null, Seq(1L, 2L)))                  // null input -> null
      .toDF("a", "b").selectExpr("graft_dot(a, b) AS d")
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
      == Seq(32L, null, null))
  }

  test("graft_inter_count equals size(array_intersect(...)) on random sorted sets") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(300) {
      def set() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
      (set(), set())
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", expr("graft_inter_count(a, b)"))
      .withColumn("slow", expr("size(array_intersect(a, b))").cast("long"))
    assert(df.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("graft_inter_count null and empty semantics") {
    val df = Seq(
      (Seq(1L, 3L, 7L), Seq(3L, 7L, 9L)),  // 2
      (Seq.empty[Long], Seq(1L, 2L)),      // 0
      (null, Seq(1L)))                     // null input -> null
      .toDF("a", "b").selectExpr("graft_inter_count(a, b) AS c")
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
      == Seq(2L, 0L, null))
  }

  test("graft_overlap_reaches equals (graft_inter_count >= alpha) on random sorted sets") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(400) {
      def set() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
      (set(), set(), rnd.nextInt(30).toLong)  // alphas straddle the early exits both ways
    }
    val df = rows.toDF("a", "b", "alpha")
      .withColumn("fast", expr("graft_overlap_reaches(a, b, alpha)"))
      .withColumn("slow", expr("graft_inter_count(a, b) >= alpha"))
    assert(df.filter(col("fast") =!= col("slow")).isEmpty)
    assert(df.filter(col("fast").isNull).isEmpty)
  }

  test("graft_overlap_reaches boundary and null semantics") {
    val df = Seq(
      (Seq(1L, 3L, 7L), Seq(3L, 7L, 9L), 2L),   // inter=2, alpha=2 -> true (exact boundary)
      (Seq(1L, 3L, 7L), Seq(3L, 7L, 9L), 3L),   // inter=2, alpha=3 -> false (upper-bound exit)
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 0L),   // alpha=0 -> true without touching elements
      (Seq.empty[Long], Seq(1L, 2L), 1L),        // empty side -> false
      (null, Seq(1L), 1L))                       // null input -> null
      .toDF("a", "b", "alpha").selectExpr("graft_overlap_reaches(a, b, alpha) AS v")
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
      == Seq(true, false, true, false, null))
  }

  test("graft_collect_capped equals collect_list-then-filter on surviving buckets") {
    // many partitions so merges of partial buffers are exercised
    val rows = (0 until 2000).map(i => (s"k${i % 37}", i.toLong))
    val df = spark.createDataFrame(rows).toDF("k", "v").repartition(16)
    val capped = df.groupBy("k")
      .agg(expr("array_sort(graft_collect_capped(v, 64)) AS ids"))
      .filter(size(col("ids")).between(2, 64))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val plain = df.groupBy("k")
      .agg(expr("array_sort(collect_list(v)) AS ids"))
      .filter(size(col("ids")).between(2, 64))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // 2000 rows over 37 keys: every bucket has 54-55 members — under the
    // cap, so all survive and the capped plan must reproduce the full
    // membership of every one (partials from 16 partitions merged)
    assert(capped.size == 37)
    assert(capped == plain)
  }

  test("graft_collect_capped drops over-cap buckets and keeps under-cap ones complete") {
    // one hot key with 1000 members, several cold keys under the cap
    val rows = (0 until 1000).map(i => ("hot", i.toLong)) ++
      (0 until 10).map(i => (s"cold${i % 2}", i.toLong))
    val df = spark.createDataFrame(rows).toDF("k", "v").repartition(8)
    val out = df.groupBy("k")
      .agg(expr("array_sort(graft_collect_capped(v, 64)) AS ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // the hot bucket's buffer is truncated at cap+1 — overflow is visible
    // but its membership never grew to 1000
    assert(out("hot").length == 65)
    // under-cap buckets are complete and exact
    assert(out("cold0") == Seq(0L, 2L, 4L, 6L, 8L))
    assert(out("cold1") == Seq(1L, 3L, 5L, 7L, 9L))
    // and the standard size filter removes the hot bucket
    val kept = df.groupBy("k")
      .agg(expr("graft_collect_capped(v, 64) AS ids"))
      .filter(size(col("ids")).between(2, 64))
      .select("k").as[String].collect().toSet
    assert(kept == Set("cold0", "cold1"))
  }

  test("graft_collect_capped collects struct elements (the SimHash member shape)") {
    val df = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"))
      .toDF("id", "sig").withColumn("k", lit("all"))
    val out = df.groupBy("k")
      .agg(expr("array_sort(graft_collect_capped(struct(id, sig), 64)) AS mem"))
      .selectExpr("transform(mem, m -> concat(m.id, ':', m.sig)) AS flat")
      .head().getSeq[String](0)
    assert(out == Seq("1:aa", "2:bb", "3:cc"))
  }

  test("graft_dot stays in codegen on an array-backed frame") {
    val plan = Tables.embeddings(spark, sfDir)
      .selectExpr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS q")
      .selectExpr("graft_dot(q, q) AS n2")
      .queryExecution.executedPlan.toString
    // the Project evaluating graft_dot must carry the WholeStageCodegen
    // star (the upstream transform HOF sits outside codegen by design,
    // so the spans split — what matters is graft_dot's span exists)
    assert("\\*\\(\\d+\\) Project \\[graft_dot".r.findFirstIn(plan).isDefined, plan)
  }
}
