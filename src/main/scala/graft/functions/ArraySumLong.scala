package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType}

/** Elementwise sum of ARRAY<BIGINT> columns as ONE mergeable aggregate —
  * the centroid-update kernel of [[graft.ext.KMeans.step]] (r18, guide
  * §2.3/§2.4): the declarative form (posexplode to (group, pos, v) rows,
  * groupBy-sum per position, then collect_list + array_sort to
  * reassemble) is semantically identical but costs a dim× row fan-out
  * plus a SECOND exchange for the reassembly; this buffer adds each
  * input array into a running long array in place, so one
  * map-side-combined exchange of K·|subs| array rows replaces two
  * exchanges of K·|subs|·dim scalar rows — per Lloyd sweep.
  *
  * Exactness: long addition elementwise, commutative/associative —
  * order-independent, so the result is bit-identical to the per-position
  * sums at any parallelism. Contract mirrors the callers': arrays in one
  * group share a length (fixed-dim lattice slices); a shorter array is
  * summed over its prefix (the buffer sizes to the longest seen; missing
  * tail elements contribute 0). NULL array elements are skipped, matching
  * sum()'s null handling on the exploded form (non-finite embeddings are
  * corrupt data upstream — the [[graft.ext.KMeans.quantize]] contract).
  */
case class ArraySumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"array_sum_long expects ARRAY<BIGINT>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def grown(buf: Array[Long], n: Int): Array[Long] =
    if (buf.length >= n) buf
    else java.util.Arrays.copyOf(buf, n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = grown(buf, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) += arr.getLong(i)
      i += 1
    }
    out
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val out = grown(b1, b2.length)
    var i = 0
    while (i < b2.length) {
      out(i) += b2(i)
      i += 1
    }
    out
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArraySumLong =
    copy(child = newChildren.head)
}

object ArraySumLong {
  /** Aggregate Column: elementwise ARRAY<BIGINT> sum (empty array for an
    * all-empty group). */
  def arraySumLong(a: Column): Column =
    ColumnBridge.column(
      ArraySumLong(ColumnBridge.expression(a)).toAggregateExpression())
}
