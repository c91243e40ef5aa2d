package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup via mergeable aggregate state — the pattern that
  * lets a 100 TB warehouse keep `GROUP BY` summaries current without
  * rescanning history: persist a small per-key STATE table
  * (count / exact sum / min / max), fold each new increment into it with
  * a key-partitioned merge, and derive the presentation row (mean, range)
  * only at read time.
  *
  * This generalizes the reference's incremental discipline — its control
  * table records which LOAD_KEYs are already folded in
  * (`CheckInterface_Metadata.py:73-79`) and each run processes only the
  * delta (`STG_Firebase2Oracle.py:52-59`) — from "append rows" to
  * "maintain aggregates".
  *
  * Algebra: every state column is a commutative monoid (sum over exact
  * decimals, min, max, count), so `merge(build(A), build(B)) ≡
  * build(A ∪ B)` holds EXACTLY, not approximately — the q_incr_rollup
  * oracle asserts the three-way-split fold hash-equals a single global
  * GROUP BY. Sums run on the integer-cents lattice (decimal accumulator)
  * so the identity is partition-order-independent.
  *
  * Scale shape: `build` on an increment touches only increment rows
  * (map-side-combined shuffle on the grouping key); `merge` shuffles
  * |keys| state rows, not data rows. The state table is
  * O(distinct keys) — at 100 TB that is the difference between a
  * minutes-long rollup refresh and a full-corpus scan.
  */
object IncrementalAgg {

  /** Aggregate an increment into mergeable state rows:
    * (keys…, cnt, sum_cents, min_v, max_v). `valCol` must sit on the
    * 2-decimal lattice (events.value does). */
  def buildState(df: DataFrame, keys: Seq[String], valCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        // state carries the WIDEST decimal (38,0): a narrower state type
        // would overflow to silent NULL (non-ANSI) after enough merges,
        // breaking the exactness contract — 10^38 cents is unreachable
        sum(round(col(valCol) * 100).cast("decimal(18,0)"))
          .cast("decimal(38,0)").as("sum_cents"),
        min(col(valCol)).as("min_v"),
        max(col(valCol)).as("max_v"))

  /** Fold any number of state tables into one (union + re-reduce). The
    * shuffle moves state rows only. */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"),
        sum(col("sum_cents")).cast("decimal(38,0)").as("sum_cents"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Presentation view over state: exact sum back in value units, mean as
    * one double division chain over the exact numerator (identical text
    * in the DuckDB oracle). */
  def finalizeState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("cnt"),
        (col("sum_cents").cast("double") / 100.0).as("sum_v"),
        (col("sum_cents").cast("double") / col("cnt") / 100.0).as("avg_v"),
        col("min_v"), col("max_v")): _*)
}
