package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType, StructField, StructType}
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

  def maxGramHash(text: Column, gram: Int): Column =
    ColumnBridge.column(MinGramHash32(ColumnBridge.expression(text), gram, isMax = true))

  /** (min, second-distinct-min, max) gram hashes in ONE pass — the
    * fingerprint bucket key for near-dup candidates. */
  def gramExtremes(text: Column, gram: Int): Column =
    ColumnBridge.column(GramExtremes(ColumnBridge.expression(text), gram))

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

/** min (or max, with isMax) over hexInt(char n-grams); texts shorter
  * than one gram hash whole (the fingerprint fallback in
  * graft.ext.TextAnalysis). The min/max pair forms the bucket key for
  * fingerprint near-dup candidates. */
case class MinGramHash32(child: Expression, gram: Int, isMax: Boolean = false)
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
      var best = if (isMax) Long.MinValue else Long.MaxValue
      var i = 0
      while (i <= n - gram) {
        val v = GramOps.hash32(md, s.substringSQL(i + 1, gram))
        if (if (isMax) v > best else v < best) best = v
        i += 1
      }
      best
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinGramHash32 =
    copy(child = newChild)
}

/** STRUCT(mn, mn2, mx): minimum, second-distinct-minimum (null when all
  * grams hash equal) and maximum of the 32-bit char-n-gram hashes, one
  * digest pass per document. Short texts hash whole into all three. */
case class GramExtremes(child: Expression, gram: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_extremes expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("mn", LongType, nullable = false),
    StructField("mn2", LongType, nullable = true),
    StructField("mx", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    val md = MessageDigest.getInstance("MD5")
    if (n < gram) {
      val h = GramOps.hash32(md, s)
      InternalRow(h, h, h)
    } else {
      var m1 = Long.MaxValue
      var m2 = Long.MaxValue
      var mx = Long.MinValue
      var i = 0
      while (i <= n - gram) {
        val v = GramOps.hash32(md, s.substringSQL(i + 1, gram))
        if (v < m1) { m2 = m1; m1 = v }
        else if (v > m1 && v < m2) m2 = v
        if (v > mx) mx = v
        i += 1
      }
      InternalRow(m1, if (m2 == Long.MaxValue) null else m2, mx)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GramExtremes =
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
