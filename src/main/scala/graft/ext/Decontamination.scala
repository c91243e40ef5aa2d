package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import Hashing._

/** Eval-set decontamination (north star; no reference equivalent): flag
  * training documents that share word n-grams with a held-out benchmark
  * set, the standard pre-training hygiene pass (13-gram overlap in GPT-3's
  * appendix; smaller n here because the synthetic corpus is short-doc).
  *
  * Scale shape: the eval side is small by construction (benchmarks are
  * thousands of documents, not billions), so its distinct grams broadcast
  * — the corpus is touched ONCE by a scan + explode + broadcast hash join,
  * never a shuffle of the text. Both aggregations are map-side combined
  * counts keyed by doc id. For a pathological eval set too big to
  * broadcast, the same plan minus the hint degrades to one shuffled
  * equi-join on the gram hash — still never all-pairs.
  */
object Decontamination {

  /** Per-document overlap against `eval`: distinct n-grams, how many of
    * them appear anywhere in the eval set, and the contaminated fraction
    * on the fixed 4-decimal grid (integer floor-division — same
    * engine-independence argument as [[TextAnalysis.qualityScore]]; the
    * products stay < 2^53·10⁴ for any physically possible gram count).
    * Documents with fewer than n words carry zero grams and report clean.
    */
  def overlapStats(docs: DataFrame, eval: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val docGrams = docs.select(col(idCol),
      explode(array_distinct(ngrams(words(col(textCol)), n))).as("gram"))
    val evalGrams = eval
      .select(explode(array_distinct(ngrams(words(col(textCol)), n))).as("gram"))
      .distinct()
    val totals = docGrams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val hits = docGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    val c = coalesce(col("n_contaminated"), lit(0L))
    val g = coalesce(col("n_grams"), lit(0L))
    val scaled = c * lit(10000L)
    docs.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), g.as("n_grams"), c.as("n_contaminated"),
        when(g > 0, ((scaled - pmod(scaled, g)) / g).cast("double") / 10000.0)
          .otherwise(lit(0.0)).as("contaminated_frac"),
        when(c > 0, 1L).otherwise(0L).as("is_contaminated"))
  }

  /** The gate itself: training docs that survive decontamination at
    * `maxFrac` (strictly-greater rejects; 0.0 = any shared gram rejects).
    * Gated on the EXACT rational `n_contaminated ≤ maxFrac · n_grams` —
    * not the 4-decimal display fraction, whose floor would leak a doc
    * with one shared gram among > 10⁴ grams through even the strictest
    * gate. */
  def clean(docs: DataFrame, eval: DataFrame, n: Int = 3,
      maxFrac: Double = 0.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.join(
      overlapStats(docs, eval, n, idCol, textCol)
        .filter(col("n_contaminated").cast("double") <=
          lit(maxFrac) * col("n_grams").cast("double"))
        .select(col(idCol)),
      Seq(idCol), "left_semi")
}
