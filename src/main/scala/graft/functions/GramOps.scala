package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-n-gram expressions for document fingerprinting.
  *
  * The declarative form (`array_min(transform(sequence(...), i =>
  * hexInt(substr(text, i, n))))`) materializes a position array and walks
  * an interpreted expression tree per gram — ~500 lambda dispatches per
  * document. These expressions run the same loop in plain JVM code; the
  * md5 work (the true cost) is identical, so results match the
  * [[graft.ext.Hashing.hexInt]]-based forms and the DuckDB oracles
  * bit-for-bit. CodegenFallback: the body is a digest loop — nothing for
  * Janino to improve — and the surrounding projection stays codegen'd.
  */
object GramOps {
  def minGramHash(text: Column, gram: Int): Column =
    ColumnBridge.column(MinGramHash32(ColumnBridge.expression(text), gram))

  def distinctGramCount(text: Column, gram: Int): Column =
    ColumnBridge.column(DistinctGramCount(ColumnBridge.expression(text), gram))

  /** First 4 md5 bytes as an unsigned 32-bit value — exactly
    * `conv(substr(md5(s),1,8),16,10)`. */
  private[functions] def hash32(md: MessageDigest, s: UTF8String): Long = {
    val d = md.digest(s.getBytes)
    md.reset()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** min over hexInt(char n-grams); texts shorter than one gram hash whole
  * (the fingerprint fallback in graft.ext.TextAnalysis). */
case class MinGramHash32(child: Expression, gram: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_gram_hash expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    val md = MessageDigest.getInstance("MD5")
    if (n < gram) GramOps.hash32(md, s)
    else {
      var min = Long.MaxValue
      var i = 0
      while (i <= n - gram) {
        val v = GramOps.hash32(md, s.substringSQL(i + 1, gram))
        if (v < min) min = v
        i += 1
      }
      min
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinGramHash32 =
    copy(child = newChild)
}

/** Number of DISTINCT char n-grams; 1 for texts shorter than one gram. */
case class DistinctGramCount(child: Expression, gram: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"distinct_gram_count expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    if (n < gram) 1L
    else {
      val seen = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i <= n - gram) {
        seen.add(s.substringSQL(i + 1, gram))
        i += 1
      }
      seen.size.toLong
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctGramCount =
    copy(child = newChild)
}
