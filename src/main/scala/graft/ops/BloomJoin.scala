package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomOps

/** Bloom-reduced semi join: the explicit form of the runtime-filter
  * rewrite Catalyst applies when `spark.sql.optimizer.runtime.bloomFilter`
  * fires — build a Bloom filter over the build side's join keys, probe it
  * as a SCAN-SIDE FILTER on the stream side, then run the exact semi join
  * only on survivors.
  *
  * Why own it instead of trusting the optimizer: the automatic rewrite is
  * gated on creation-side size heuristics and silently declines on, e.g.,
  * a selective-but-unstatistic'd build side. At 100 TB the difference is
  * material — the Bloom probe drops non-matching fact rows AT THE SCAN
  * (a codegen'd `might_contain` over an xxhash64, no shuffle, no build
  * relation in memory per row), so the exact join's shuffle/broadcast
  * sees only `|matching| + ε·|fact|` rows (ε = false-positive rate)
  * instead of the full fact table.
  *
  * Correctness is unconditional: Bloom filters have no false negatives,
  * and the exact semi join removes the ε false positives — the result
  * hash-equals a plain `LEFT SEMI JOIN` (asserted by q_bloom_semijoin's
  * oracle, which is exactly that join with no Bloom anywhere).
  */
object BloomJoin {

  /** Filter sizing WITHOUT a counting job. Precedence: caller-supplied →
    * plan/catalog row-count stats → a bounded overestimate derived from
    * the plan's `sizeInBytes` (assuming ≥16 bytes/row; overestimating
    * costs bits, never correctness). A `dim.count()` here would run a
    * whole extra Spark job just to size the filter — at 100 TB the dim
    * count must come from statistics, not a scan. Floored at 1024 items;
    * past 2²⁴ items (≈ 20 MiB of filter at 1 % fpp) returns None and the
    * caller SKIPS the Bloom entirely — a filter sized for fewer items
    * than the dim holds quietly degrades its fpp toward 1, paying the
    * build+broadcast for no pruning (ADVICE r6). */
  private[ops] def sizeHint(dim: DataFrame, explicit: Option[Long]): Option[Long] = {
    val raw = explicit.getOrElse {
      val stats = dim.queryExecution.optimizedPlan.stats
      stats.rowCount.map(_.min(BigInt(Long.MaxValue)).toLong).getOrElse(
        stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong / 16L)
    }
    if (raw > (1L << 24)) None else Some(math.max(raw, 1024L))
  }

  /** `fact LEFT SEMI JOIN dim ON fact(factKey) = dim(dimKey)`, with a
    * Bloom pre-filter on the fact scan. `expectedItems` sizes the filter
    * (distinct dim keys; over-estimating costs bits, under-estimating
    * costs ε); when None the size comes from [[sizeHint]] — no extra
    * job. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): DataFrame =
    sizeHint(dim, expectedItems) match {
      case None =>
        // dim too large for a useful filter — plain exact semi join
        fact.join(dim.select(col(dimKey)).distinct(),
          col(factKey) === col(dimKey), "left_semi")
      case Some(expected) =>
        val numBits = BloomOps.optimalNumBits(expected, fpp)
        val bloomRow = dim.select(xxhash64(col(dimKey)).as("__h"))
          .agg(BloomOps.bloomAgg(col("__h"), expected, numBits).as("bf"))
          .head()
        val pruned =
          if (bloomRow.isNullAt(0)) fact.limit(0) // empty dim: empty semi join
          else fact.filter(
            BloomOps.mightContain(lit(bloomRow.getAs[Array[Byte]](0)),
              xxhash64(col(factKey))))
        pruned.join(dim.select(col(dimKey)).distinct(),
          col(factKey) === col(dimKey), "left_semi")
    }

  /** The probe column alone — for wiring the same pre-filter into plans
    * that end in something other than a semi join (e.g. an enrichment
    * join that would otherwise shuffle the full fact side). */
  def bloomProbe(dim: DataFrame, dimKey: String, factKey: Column,
      expectedItems: Option[Long] = None, fpp: Double = 0.01): Column =
    sizeHint(dim, expectedItems) match {
      case None => lit(true) // dim too large: probe prunes nothing
      case Some(expected) =>
        val numBits = BloomOps.optimalNumBits(expected, fpp)
        val bloomRow = dim.select(xxhash64(col(dimKey)).as("__h"))
          .agg(BloomOps.bloomAgg(col("__h"), expected, numBits).as("bf"))
          .head()
        if (bloomRow.isNullAt(0)) lit(false)
        else BloomOps.mightContain(lit(bloomRow.getAs[Array[Byte]](0)),
          xxhash64(factKey))
    }
}
