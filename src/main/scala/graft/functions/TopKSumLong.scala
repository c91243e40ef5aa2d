package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, NullType}

/** Sum of the k LARGEST BIGINT values of a group, as one mergeable
  * aggregate — the k-NN-sum kernel of [[graft.ext.Similarity.bitextMine]]
  * (r18, guide §2.3/§2.4): the margin denominators sx/sy are the sums of
  * each side's top-k cosines, previously computed as a row_number window
  * over the full candidate stream (one EXCHANGE + full per-partition SORT
  * per side) followed by a filter and a second groupBy. The sum of a
  * top-k-by-(value desc, id) selection depends only on the MULTISET of
  * the k largest values (ties at the boundary contribute the same value
  * whichever id wins), so a bounded k-slot buffer is bit-identical —
  * and it partial-aggregates map-side, turning two sort+window passes
  * into two map-side-combined hash aggregates at any corpus size.
  *
  * NULL inputs are skipped (they sorted last under `desc` and were
  * filtered by rn <= k whenever k non-null rows existed; callers feed
  * non-null lattice values by construction). Groups with fewer than k
  * values sum what they have, exactly like the windowed form.
  */
case class TopKSumLong(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k >= 1, s"top_k_sum_long needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_k_sum_long expects BIGINT, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  // buffer: the up-to-k largest values seen, unordered except slot 0 is
  // NOT maintained as a heap — k is tiny (single digits), a linear min
  // scan per replacement is cheaper than heap bookkeeping
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def add(buf: Array[Long], v: Long): Array[Long] =
    if (buf.length < k) {
      val out = java.util.Arrays.copyOf(buf, buf.length + 1)
      out(buf.length) = v
      out
    } else {
      var mi = 0
      var i = 1
      while (i < buf.length) {
        if (buf(i) < buf(mi)) mi = i
        i += 1
      }
      if (v > buf(mi)) buf(mi) = v
      buf
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[Long])
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var out = b1
    var i = 0
    while (i < b2.length) {
      out = add(out, b2(i))
      i += 1
    }
    out
  }

  override def eval(buf: Array[Long]): Any = {
    var s = 0L
    var i = 0
    while (i < buf.length) { s += buf(i); i += 1 }
    s
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSumLong =
    copy(child = newChildren.head)
}

object TopKSumLong {
  /** Aggregate Column: sum of the k largest BIGINT values (0 for an
    * all-null/empty group — the windowed form's sum() would yield null
    * there; callers guard with coalesce where that case is reachable). */
  def topKSumLong(v: Column, k: Int): Column =
    ColumnBridge.column(
      TopKSumLong(ColumnBridge.expression(v), k).toAggregateExpression())
}
