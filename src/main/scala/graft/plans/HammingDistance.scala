package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two equal-length
  * strings (bit-signature comparison for SimHash near-dup, q35).
  *
  * Why a custom `Expression` (SURVEY §7.3 preference order (b)): the
  * composable alternative — `aggregate(transform(sequence(1, n), i ->
  * substring ≠ substring), …)` — builds two fresh substring objects and
  * an interpreted lambda frame per character per row; higher-order
  * functions do not participate in whole-stage codegen. This expression
  * byte-compares the two UTF8 buffers in a tight generated loop, staying
  * inside the codegen span. Distance here is defined over bytes, which
  * equals character Hamming distance for the ASCII bit-strings it serves
  * (and any equal-length ASCII keys); inputs of different byte length
  * yield null (callers compare fixed-width signatures).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_hamming requires (string, string), got (${left.dataType}, ${right.dataType})")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    if (a.length != b.length) null
    else {
      var d = 0
      var i = 0
      while (i < a.length) {
        if (a(i) != b(i)) d += 1
        i += 1
      }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |byte[] $a = $l.getBytes();
         |byte[] $b = $r.getBytes();
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    if ($a[$i] != $b[$i]) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
