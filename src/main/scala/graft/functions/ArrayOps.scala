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
  * null/ordering contract as [[SquaredDistanceLong]]. */
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
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int dpl_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long dpl_acc = 0L;
         |for (int dpl_i = 0; dpl_i < dpl_n; dpl_i++) {
         |  if ($a.isNullAt(dpl_i) || $b.isNullAt(dpl_i)) { ${ev.isNull} = true; break; }
         |  dpl_acc += $a.getLong(dpl_i) * $b.getLong(dpl_i);
         |}
         |${ev.value} = dpl_acc;
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
  * the engine. Null handling matches the higher-order form (null array
  * or element → null). Overflow-safe for the 10⁴ lattice up to ~10⁹ per
  * component (squares < 2⁶³/dim). */
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
    val n = math.min(x.numElements(), y.numElements())
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int sdl_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long sdl_acc = 0L;
         |for (int sdl_i = 0; sdl_i < sdl_n; sdl_i++) {
         |  if ($a.isNullAt(sdl_i) || $b.isNullAt(sdl_i)) { ${ev.isNull} = true; break; }
         |  long sdl_d = $a.getLong(sdl_i) - $b.getLong(sdl_i);
         |  sdl_acc += sdl_d * sdl_d;
         |}
         |${ev.value} = sdl_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistanceLong =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two ARRAY<DOUBLE> columns, accumulated sequentially in
  * index order (IEEE-identical to `aggregate(zip_with(a,b,_*_),0.0,_+_)`).
  * Null array or any null element → null, matching zip_with/aggregate
  * null propagation. Lengths must match (zip_with would null-pad; the
  * engine only calls this on fixed-dimension embedding columns). */
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int dp_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dp_acc = 0.0;
         |for (int dp_i = 0; dp_i < dp_n; dp_i++) {
         |  if ($a.isNullAt(dp_i) || $b.isNullAt(dp_i)) { ${ev.isNull} = true; break; }
         |  dp_acc += $a.getDouble(dp_i) * $b.getDouble(dp_i);
         |}
         |${ev.value} = dp_acc;
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |int[] sh_votes = new int[32];
         |boolean sh_null = false;
         |for (int sh_i = 0; sh_i < $a.numElements(); sh_i++) {
         |  if ($a.isNullAt(sh_i)) { sh_null = true; break; }
         |  long sh_h = $a.getLong(sh_i);
         |  for (int sh_b = 0; sh_b < 32; sh_b++) {
         |    sh_votes[sh_b] += (((sh_h >> sh_b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |if (sh_null) { ${ev.isNull} = true; } else {
         |  long sh_fp = 0L;
         |  for (int sh_b = 0; sh_b < 32; sh_b++) {
         |    if (sh_votes[sh_b] > 0) sh_fp |= (1L << sh_b);
         |  }
         |  ${ev.value} = sh_fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
