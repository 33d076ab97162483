package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_collect_capped(x, cap)` — a collect_list whose aggregation
  * buffer NEVER holds more than cap+1 elements, for cap-and-drop
  * bucketing (LSH bands, SimHash halves, cosine plane signatures).
  *
  * The plain formulation — `collect_list` then `filter(size <= cap)` —
  * is correct in the logical plan but unbounded in the physical one: a
  * skew-saturated key (90% of a corpus on one band signature — see the
  * adversarial probe in BASELINE.md) materializes its ENTIRE member
  * array inside one aggregation buffer before the size filter can drop
  * it. Invisible at test scale, an executor OOM at 100 TB. This
  * aggregate stops collecting at cap+1: over-cap buckets still surface
  * (with exactly cap+1 elements, so `size(...) > cap` drops them
  * downstream — membership is bucket-sized, never corpus-sized), and
  * under-cap buckets keep every element, so the surviving results are
  * IDENTICAL to the collect_list plan. Partial (map-side) buffers obey
  * the same bound, and merges truncate at cap+1, so the hot key costs
  * O(cap) per task everywhere in the plan — one shuffle, no auxiliary
  * count pass.
  *
  * Runs under ObjectHashAggregateExec (the TypedImperativeAggregate
  * engine), which partial-aggregates map-side like any hash aggregate.
  * Element order is aggregation order (nondeterministic, like
  * collect_list) — callers `array_sort` the result, and surviving
  * buckets are complete sets, so the sorted output is deterministic.
  */
case class CappedCollect(
    child: Expression,
    capExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue

  override def children: Seq[Expression] = Seq(child, capExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollect =
    copy(child = newChildren(0), capExpr = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!capExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(capExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_collect_capped cap must be an integer literal")
    else if (capExpr.eval() == null || capExpr.eval().asInstanceOf[Number].intValue < 1)
      TypeCheckResult.TypeCheckFailure("graft_collect_capped cap must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_collect_capped"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.length <= cap) { // cap+1th element marks overflow; beyond it, drop
      val v = child.eval(input)
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  // Shuffle format: one UnsafeRow holding the buffer as an array column —
  // the same scheme Spark's own Collect aggregates use, including the
  // cached projection/row: serialize runs once per KEY per exchange, and
  // in the prune-less plans (q35/q39) every band key — millions of
  // singletons at scale — pays it, so a per-call UnsafeProjection.create
  // (a codegen-cache lookup) would sit on that path.
  @transient private lazy val serializeProjection = UnsafeProjection.create(
    Array[DataType](ArrayType(elementType = child.dataType, containsNull = false)))
  @transient private lazy val deserializeRow = new UnsafeRow(1)

  override def serialize(obj: mutable.ArrayBuffer[Any]): Array[Byte] =
    serializeProjection.apply(InternalRow.apply(new GenericArrayData(obj.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buffer = createAggregationBuffer()
    val row = deserializeRow
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, x: Any) => buffer += x)
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
}
