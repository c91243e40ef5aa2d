package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers over Spark's native Bloom-filter machinery — the same
  * `BloomFilterAggregate`/`BloomFilterMightContain` pair Catalyst injects
  * for runtime row-level join filters, exposed as a first-class sketch.
  * Both sides are codegen'd; the aggregate is a mergeable
  * TypedImperativeAggregate (map-side partials, one small merged buffer).
  */
object BloomOps {

  /** Optimal bit count for `n` expected items at false-positive rate `p`
    * (the standard m = -n·ln p / ln²2). */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need items > 0 and 0 < fpp < 1, got $expectedItems / $fpp")
    math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
  }

  /** Aggregate a LONG hash column into a serialized Bloom filter
    * (BINARY). Null hashes are skipped by the aggregate; zero input rows
    * yield a null buffer — callers must treat null as "empty filter". */
  def bloomAgg(hashes: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashes),
      ColumnBridge.expression(lit(expectedItems)),
      ColumnBridge.expression(lit(numBits))).toAggregateExpression())

  /** Membership probe of a LONG hash against a serialized filter; the
    * filter side must be foldable (a literal), which also means it ships
    * to executors once inside the task binary, not per row. */
  def mightContain(bloom: Column, hash: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hash)))
}
