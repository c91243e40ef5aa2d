package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for corpus-scale profiling (engine capability
  * beyond reference parity — the reference's only aggregates are scalar
  * MAXes, SURVEY §2.4).
  *
  * These are the one-pass, fixed-memory summaries a 100 TB profile run
  * needs: HyperLogLog++ cardinalities and t-digest-style quantiles, both
  * map-side partial and mergeable (Spark's native sketch aggregates).
  * No DuckDB oracle — sketch internals differ across engines — so their
  * contracts are spec-tested against exact answers with error bounds
  * (SketchesSpec) instead of hash-compared.
  */
object Sketches {

  /** Distinct-count profile per group: HLL++ estimate next to the scan's
    * exact count, with relative standard deviation `rsd`. */
  def approxDistinctProfile(df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.02): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        count(col(valueCol)).as("n_rows"))

  /** Quantile summary of a numeric column (single-pass, mergeable). */
  def quantileProfile(df: DataFrame, valueCol: String,
      quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
      relativeError: Double = 0.01): DataFrame =
    df.agg(percentile_approx(col(valueCol),
      typedlit(quantiles), lit((1.0 / relativeError).toInt)).as("quantiles"))

  /** Frequent-items sketch via count-min-style grouping: top-k heavy
    * hitters with exact counts after a candidate pass. One shuffle of
    * (value, partial count) pairs. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.groupBy(col(valueCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(valueCol))
      .limit(k)
}
