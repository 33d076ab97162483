package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED-ascending BIGINT
  * arrays — the verification kernel of the exact set-similarity join
  * (q32 and anything else that scores Jaccard over hashed-shingle sets).
  *
  * Why a custom `Expression` (SURVEY §7.3 preference order (b)):
  * `size(array_intersect(a, b))` builds a hash set and materializes the
  * intersection ARRAY per row just to take its length — per-row
  * allocations in the hottest loop of the candidate-verification stage,
  * which at 100 TB runs once per candidate pair. The shingle sets are
  * produced by `sort_array`, so a two-pointer merge counts the overlap
  * with zero allocation inside one whole-stage-codegen span.
  *
  * Contract: inputs must be sorted ascending and duplicate-free (the
  * shape `sort_array(array_distinct(...))` produces); null elements make
  * the result null (corrupt input, not a score). Unsorted input gives an
  * undefined count — this is the documented precondition, as with any
  * merge-join operand.
  */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_inter_count requires (array<bigint>, array<bigint>), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_inter_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      s"""
         |int $na = $l.numElements();
         |int $nb = $r.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |boolean $bad = false;
         |while ($i < $na && $j < $nb && !$bad) {
         |  if ($l.isNullAt($i) || $r.isNullAt($j)) { $bad = true; }
         |  else {
         |    long $x = $l.getLong($i);
         |    long $y = $r.getLong($j);
         |    if ($x < $y) { $i++; }
         |    else if ($x > $y) { $j++; }
         |    else { $c++; $i++; $j++; }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: |A ∩ B| ≥ alpha for two SORTED-ascending
  * BIGINT arrays, with EARLY EXIT in both directions — the candidate
  * assassin of the exact set-similarity join (q32).
  *
  * Why it exists: on a corpus whose shingle universe is small (the
  * driver's documents table draws from a 31-token vocabulary → ~1k
  * distinct bigram shingles), EVERY content-keyed candidate filter
  * collapses — prefix-filter raw candidates grow ~quadratically
  * (measured: 6.0M at sf0.1 → 612.7M at sf1, a 102× step for 10× data),
  * and a pigeonhole segment join measures WORSE (686M; see BASELINE.md
  * round-9 analysis). Rather than materializing those pairs into a
  * distinct + two verification joins, this predicate runs INSIDE the
  * prefix join's condition: the two-pointer merge maintains the exact
  * upper bound `matched + min(remaining)` and returns false the moment
  * it drops below alpha — for a dissimilar pair that is ~(symmetric-
  * difference budget) merge steps (≈12 at Jaccard 0.8, set size ~50),
  * not a full intersection. Matched rows then die inside the join loop
  * and only true near-dup pairs reach the shuffle.
  *
  * EXACT, not a heuristic: returns precisely (|A∩B| ≥ alpha); early
  * termination only skips work whose outcome is already decided. Same
  * sortedness/duplicate-free precondition and null semantics as
  * [[SortedInterCount]].
  */
case class OverlapReaches(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_overlap_reaches requires (array<bigint>, array<bigint>, bigint), got ($a, $b, $c)")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_overlap_reaches"

  override def nullSafeEval(l: Any, r: Any, t: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val alpha = t.asInstanceOf[Long]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (c < alpha && c + math.min(na - i, nb - j) >= alpha) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c >= alpha
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (l, r, t) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      val rem = ctx.freshName("rem")
      s"""
         |int $na = $l.numElements();
         |int $nb = $r.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |boolean $bad = false;
         |while ($c < $t && !$bad) {
         |  long $rem = ($na - $i < $nb - $j) ? ($na - $i) : ($nb - $j);
         |  if ($c + $rem < $t) break;
         |  if ($l.isNullAt($i) || $r.isNullAt($j)) { $bad = true; }
         |  else {
         |    long $x = $l.getLong($i);
         |    long $y = $r.getLong($j);
         |    if ($x < $y) { $i++; }
         |    else if ($x > $y) { $j++; }
         |    else { $c++; $i++; $j++; }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $c >= $t; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
