package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Equi-depth bucket index of a double against a sorted cut-point array:
  * the count of cuts ≤ x (an upper-bound binary search), i.e. the
  * approximate rank bucket in [0, |cuts|].
  *
  * Exists because the declarative spelling —
  * `aggregate(lit(cuts), 0L, (acc, b) => acc + when(x >= b, 1))` — is an
  * `ArrayAggregate`, which has NO codegen: 2^bits interpreted
  * CaseWhen/Cast/Add dispatches per row, and the literal array re-appears
  * in every duplicated instance of the expression (measured in
  * [[ZOrder.zValue]]'s interleave: a 28 MiB serialized task and one
  * 770 s-CPU sampling task at sf0.1). This form is ~8 comparisons/row
  * inside whole-stage codegen with the cuts shipped once as a reference
  * object.
  *
  * Null and NaN inputs bucket to 0 — neither carries pruning information,
  * and min/max footer stats skip them anyway (matches the fold form,
  * where every comparison against null/NaN fails).
  */
case class QuantileBucket(child: Expression, cuts: IndexedSeq[Double])
    extends UnaryExpression {

  // cuts is an immutable IndexedSeq (NOT Array) so the case-class
  // equals/hashCode are structural: semantically identical instances
  // canonicalize together and common-subexpression elimination can
  // collapse the interleave's duplicated probes. The primitive array the
  // hot path needs is derived once per (deserialized) instance.
  @transient private lazy val cutsArr: Array[Double] = cuts.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket expects DOUBLE, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def search(x: Double): Long = {
    val a = cutsArr
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else search(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("qbCuts", cutsArr, "double[]")
    val childGen = child.genCode(ctx)
    val x = ctx.freshName("qbX")
    val lo = ctx.freshName("qbLo")
    val hi = ctx.freshName("qbHi")
    val mid = ctx.freshName("qbMid")
    ev.copy(
      code = code"""
        |${childGen.code}
        |long ${ev.value} = 0L;
        |if (!${childGen.isNull}) {
        |  double $x = ${childGen.value};
        |  int $lo = 0;
        |  int $hi = $cutsRef.length;
        |  while ($lo < $hi) {
        |    int $mid = ($lo + $hi) >>> 1;
        |    if ($cutsRef[$mid] <= $x) { $lo = $mid + 1; } else { $hi = $mid; }
        |  }
        |  ${ev.value} = (long) $lo;
        |}
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
    copy(child = newChild)
}
