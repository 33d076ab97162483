package graft

import java.sql.Timestamp
import graft.incremental.{Intervals, SchemaReconcile}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator properties for the algebraic pieces: interval
  * chunking partitions its range, the schema truth table partitions
  * column sets, and pivot/unpivot round-trip (the R1/R3 inverse pair).
  * Cases are drawn from seeded generators so runs are reproducible. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Draw `n` deterministic samples from `gen` and check each. */
  private def forAllN[A](gen: Gen[A], n: Int = 50)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var drawn = 0
    var attempts = 0
    while (drawn < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); drawn += 1
        case None =>
      }
      seed = seed.next
      attempts += 1
    }
    assert(drawn == n, s"generator too sparse: $drawn/$n")
  }

  private val tsGen: Gen[Timestamp] =
    Gen.choose(1577836800000L, 1893456000000L).map(new Timestamp(_)) // 2020..2030

  test("Intervals.chunks covers (start, end] exactly, in order, without overlap") {
    val gen = for {
      start <- tsGen
      span <- Gen.choose(1L, 3L * 86400L * 1000L)
      step <- Gen.choose(60L, 2L * 86400L)
    } yield (start, span, step)
    forAllN(gen) { case (start, spanMs, step) =>
      val end = new Timestamp(start.getTime + spanMs)
      val cs = Intervals.chunks(start, end, step, maxChunks = Int.MaxValue)
      assert(cs.head._1 == start && cs.last._2 == end)
      cs.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 == s2) // contiguous, no gap/overlap
        case _ =>
      }
      cs.foreach { case (s, e) =>
        assert(e.getTime - s.getTime <= step * 1000L && s.before(e))
      }
    }
  }

  test("columnState: add/del partition the symmetric difference; ret iff del empty") {
    val cols = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.distinct)
    forAllN(Gen.zip(cols, cols)) { case (source, sink) =>
      val st = SchemaReconcile.columnState(source, sink)
      assert(st.add.toSet == (source.toSet -- sink.toSet))
      assert(st.del.toSet == (sink.toSet -- source.toSet))
      assert(st.ret == st.del.isEmpty)
      assert(st.add.toSet.intersect(st.del.toSet).isEmpty)
    }
  }

  test("pivot then unpivot round-trips the long EAV relation (R1/R3 inverses)") {
    import org.apache.spark.sql.functions.{col, first}
    val attrs = Seq("p1", "p2", "p3")
    val rowsGen = Gen.listOfN(30,
      for {
        id <- Gen.choose(1, 8)
        attr <- Gen.oneOf(attrs)
        v <- Gen.choose(-1000, 1000)
      } yield (id, attr, v.toDouble))
      .map(_.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq) // unique (id, attr)
      .suchThat(_.nonEmpty)
    forAllN(rowsGen, n = 10) { rows =>
      val long = rows.toDF("id", "attr", "v")
      val wide = long.groupBy("id").pivot("attr", attrs).agg(first("v"))
      val back = wide.unpivot(Array(col("id")), attrs.map(col).toArray, "attr", "v")
        .filter(col("v").isNotNull)
      assert(back.exceptAll(long).isEmpty && long.exceptAll(back).isEmpty)
    }
  }
}
