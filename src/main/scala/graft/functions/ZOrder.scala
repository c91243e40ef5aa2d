package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Z-order (Morton) interleave over 2-4 numeric columns, as a pure
  * codegen'd column expression — the multi-dimensional clustering key
  * behind Delta's `OPTIMIZE ZORDER BY` and Hudi's space-filling-curve
  * layout, re-derived from the public definition (interleave the bits of
  * the dimensions' rank buckets).
  *
  * Why it matters at 100 TB: [[graft.store.TableStore.overwriteClustered]]
  * (lexicographic range sort) gives perfect file pruning on the FIRST
  * cluster column and none on the rest; a Z-curve trades a little
  * first-column locality for bounded locality in EVERY dimension, so a
  * box predicate on any subset of the cluster columns skips most files on
  * parquet footer stats alone.
  *
  * Buckets are EQUI-DEPTH, not min-max: each column maps to its
  * approximate rank bucket via sample-estimated quantile cut points
  * (`df.stat.approxQuantile` — one pass, 2^bits·K doubles to the driver).
  * Min-max scaling collapses under skew — on the events table 63 % of
  * rows share the bottom 10 % of the value range, which starves the
  * curve's value bits of information (measured: a 12 %-selectivity band
  * touched 15/16 files min-max, 4/16 equi-depth). Rank bucketing is also
  * what the production implementations use (Delta's
  * `range_partition_id`). The probe is [[QuantileBucket]] — a codegen'd
  * binary search against the cut array, shipped once per expression as a
  * reference object (the declarative `aggregate(lit(cuts), …)` fold is
  * interpreted ArrayAggregate and re-serializes the array per duplicated
  * instance: 28 MiB tasks and a 770 s sampling stage at sf0.1) —
  * layout-time-only cost, no UDF, no extra shuffle.
  */
object ZOrder {

  /** Equi-depth bucket of `c` given ascending `cuts` (2^bits − 1 interior
    * quantile cut points): the count of cut points ≤ x. Nulls land in
    * bucket 0 (they carry no pruning information either way). */
  private def bucket(c: Column, cuts: Array[Double]): Column =
    ColumnBridge.column(
      QuantileBucket(ColumnBridge.expression(c.cast("double")), cuts.toIndexedSeq))

  /** Interleave `bits`-wide bucket values round-robin: output bit
    * (i·D + d) takes bucket d's bit i — so every dimension contributes
    * to the high-order bits and no single column dominates the sort.
    * Built as a fixed O(bits·D) shift/or expression tree — constant
    * shifts, codegen-friendly. */
  private def interleave(bs: Seq[Column], bits: Int): Column =
    (0 until bits).flatMap { i =>
      bs.zipWithIndex.map { case (b, d) =>
        shiftleft(shiftright(b, i).bitwiseAND(1L), i * bs.size + d)
      }
    }.reduce(_.bitwiseOR(_))

  /** The z-value column for `cols` over `df`'s observed (sampled)
    * quantiles. Runs one stats pass to fetch the cut points. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.size >= 2 && cols.size <= 4, s"z-order wants 2-4 cols, got ${cols.size}")
    require(bits * cols.size <= 62, s"bits*dims must fit a long, got $bits*${cols.size}")
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val doubled = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    val cuts = doubled.stat.approxQuantile(cols.toArray, probs, 0.001)
    val bs = cols.zip(cuts).map { case (c, cut) => bucket(col(c), cut) }
    interleave(bs, bits)
  }
}
