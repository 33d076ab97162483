package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: integer dot product of two BIGINT arrays —
  * the inner loop of every quantized-vector scorer (ANN verification
  * q39/q48, and any cosine ranking over the fixed-point embeddings).
  *
  * Why a custom `Expression` (SURVEY §7.3 preference order (b)): the
  * composable alternative `aggregate(zip_with(a, b, (x, y) -> x * y),
  * 0L, (acc, v) -> acc + v)` materializes an intermediate array and
  * evaluates two interpreted lambda frames per element per row —
  * higher-order functions sit outside whole-stage codegen. This
  * expression multiplies the two long vectors in one tight generated
  * loop over the unsafe array buffers, staying inside the codegen span.
  * Inputs of different length (or with null elements) yield null —
  * quantized embedding vectors are fixed-width and dense, so null marks
  * corrupt input rather than silently scoring a prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires (array<bigint>, array<bigint>), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var s = 0L
      var i = 0
      var bad = false
      while (i < n && !bad) {
        if (a.isNullAt(i) || b.isNullAt(i)) bad = true
        else s += a.getLong(i) * b.getLong(i)
        i += 1
      }
      if (bad) null else s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n && !$bad; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; }
         |    else { $s += $l.getLong($i) * $r.getLong($i); }
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
