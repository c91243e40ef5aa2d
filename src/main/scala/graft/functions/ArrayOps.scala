package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, NullType}

/** Native Catalyst expressions for the embedding/dedup hot paths.
  *
  * The declarative equivalents (`aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * and 32 per-bit `aggregate` votes) are semantically identical but run
  * interpreted — a lambda dispatch per array element. On the similarity
  * queries that is ~10⁸ lambda evaluations per run. These expressions emit
  * a tight Java loop inside whole-stage codegen instead, with the SAME
  * left-to-right accumulation order, so results are bit-identical to the
  * higher-order-function forms (and to the DuckDB oracles).
  */
object ArrayOps {
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash32(wordHashes: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(wordHashes)))

  def squaredDistanceLong(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistanceLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dotProductLong(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Σ aᵢ·bᵢ over two ARRAY<BIGINT> columns — the SQ8 scoring kernel
  * ([[graft.ext.Similarity]] `sq8TopK`): int8 codes dot exactly in int64
  * (|code| ≤ 127 ⇒ |Σ| ≤ 127²·dim ≪ 2⁶³ up to billion-dim). Same
  * null/ordering contract as [[SquaredDistanceLong]], including null on
  * mismatched lengths (ADVICE r4: the higher-order twin null-pads the
  * shorter array, which nulls the aggregate — a silent partial dot over
  * min(len) would mask malformed/mixed-dimension data). */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product_long expects two ARRAY<BIGINT>, got ${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  // locals MUST be ctx.freshName'd: two instances of the expression in one
  // codegen function (e.g. a query scoring against two code columns)
  // otherwise redeclare the same Java local, janino rejects the class, and
  // the whole stage silently falls back to interpreted mode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dplN")
      val acc = ctx.freshName("dplAcc")
      val i = ctx.freshName("dplI")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two ARRAY<BIGINT> columns — the k-means assignment
  * kernel ([[graft.ext.KMeans]]). Exact integer arithmetic, identical to
  * `aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)),0L,_+_)` but a tight
  * codegen loop instead of a lambda dispatch per element: assignment is
  * corpus·K·dim evaluations per Lloyd sweep, the hottest integer loop in
  * the engine. Null handling matches the higher-order form (null array,
  * null element, or mismatched lengths → null — zip_with's null-padding
  * nulls the aggregate, so a min(len) partial distance would diverge).
  * Overflow-safe for the 10⁴ lattice up to ~10⁹ per component
  * (squares < 2⁶³/dim). */
case class SquaredDistanceLong(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_distance_long expects two ARRAY<BIGINT>, got ${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  // freshName'd locals — see DotProductLong.doGenCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("sdlN")
      val acc = ctx.freshName("sdlAcc")
      val i = ctx.freshName("sdlI")
      val d = ctx.freshName("sdlD")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistanceLong =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two ARRAY<DOUBLE> columns, accumulated sequentially in
  * index order (IEEE-identical to `aggregate(zip_with(a,b,_*_),0.0,_+_)`).
  * Null array or any null element → null, matching zip_with/aggregate
  * null propagation over the common prefix. Unequal lengths TRUNCATE to
  * the shorter array — deliberately, and unlike the integer kernels
  * below: [[graft.ext.Similarity]]'s sign-LSH keeps ±1 hyperplane
  * literals at a fixed maxDim and dots embeddings of any dimension ≤
  * maxDim against them, so the prefix-dot IS the operator's contract
  * (`aggregate(zip_with(slice(b, 1, size(a)), a, _ * _), 0.0, _ + _)`
  * is the exact higher-order twin). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // NullType admitted: a literal NULL argument yields NULL via the
  // standard null-intolerant BinaryExpression path
  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two ARRAY<DOUBLE>, got ${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  // freshName'd locals — see DotProductLong.doGenCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dpN")
      val acc = ctx.freshName("dpAcc")
      val i = ctx.freshName("dpI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** 32-bit SimHash over an ARRAY<BIGINT> of 32-bit word hashes: one pass
  * accumulates the ±1 vote per bit position, then sets bit i iff its vote
  * is positive. Equal to the 32-aggregate higher-order form in
  * graft.ext.Dedup but with one array traversal instead of 32 and no
  * interpreted lambdas. Null array or element → null. */
case class SimHash32(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects ARRAY<BIGINT>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    var i = 0
    while (i < xs.numElements()) {
      if (xs.isNullAt(i)) return null
      val h = xs.getLong(i)
      var b = 0
      while (b < 32) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  // freshName'd locals — see DotProductLong.doGenCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("shVotes")
      val nul = ctx.freshName("shNull")
      val i = ctx.freshName("shI")
      val h = ctx.freshName("shH")
      val b = ctx.freshName("shB")
      val b2 = ctx.freshName("shB")
      val fp = ctx.freshName("shFp")
      s"""
         |int[] $votes = new int[32];
         |boolean $nul = false;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { $nul = true; break; }
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 32; $b++) {
         |    $votes[$b] += ((($h >> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |if ($nul) { ${ev.isNull} = true; } else {
         |  long $fp = 0L;
         |  for (int $b2 = 0; $b2 < 32; $b2++) {
         |    if ($votes[$b2] > 0) $fp |= (1L << $b2);
         |  }
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
