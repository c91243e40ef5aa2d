package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Threshold-sweep evaluation of a SCORE column against a binary label —
  * the readout that calibrates every filter model in a curation pipeline
  * (quality classifier, language gate, toxicity score): before a
  * threshold is frozen into the funnel, the ROC curve says what each
  * cut-point costs in recall, and AUC summarizes the ranker
  * threshold-free. No reference equivalent — north-star extension
  * surface alongside [[Classifier.evaluate]].
  *
  * Exactness: scores are expected on an integer lattice (q4 quality,
  * long counts — any orderable integer), labels in {0,1}. TPR/FPR/AUC
  * are exact integer ratios floored to the 10⁻⁶ grid, so both engines
  * hash-agree. AUC is the exact trapezoid sum over the merged-tie ROC
  * points: Σ Δfp·(tp_i + tp_{i-1}) / (2·P·N) — computed entirely on
  * BIGINTs (bounded by corpus² ≪ 2⁶³).
  *
  * Scale shape: ONE corpus pass aggregates to per-distinct-score
  * (pos, neg) counts — map-side combined, output bounded by the score
  * lattice (≤ 10⁴ rows for q4), NOT corpus rows. The cumulative window
  * then runs over that lattice-sized frame: the single-partition window
  * is bounded-input by construction, never a corpus funnel. */
object Eval {

  /** ROC points, one per distinct score, descending (ties merged — the
    * standard curve): (score, tp, fp, fn, tn, tpr, fpr). A point's
    * counts are for the rule "predict positive when value ≥ score". */
  def rocPoints(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).cast("long").as("score"))
      .agg(sum(col(labelCol).cast("long")).as("pos"),
        (count(lit(1)) - sum(col(labelCol).cast("long"))).as("neg"))
    // lattice-sized input: cumulative counts sweep thresholds high→low
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore.select(col("score"),
      sum(col("pos")).over(w).as("tp"), sum(col("neg")).over(w).as("fp"))
    val tot = df.agg(sum(col(labelCol).cast("long")).as("p_tot"),
      (count(lit(1)) - sum(col(labelCol).cast("long"))).as("n_tot"))
    def frac6(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) = {
      val s = num * lit(1000000L)
      when(den > 0, ((s - pmod(s, den)) / den).cast("double") / 1000000.0)
        .otherwise(lit(0.0))
    }
    cum.crossJoin(broadcast(tot))
      .select(col("score"), col("tp"), col("fp"),
        (col("p_tot") - col("tp")).as("fn"),
        (col("n_tot") - col("fp")).as("tn"),
        frac6(col("tp"), col("p_tot")).as("tpr"),
        frac6(col("fp"), col("n_tot")).as("fpr"))
  }

  /** Exact trapezoid AUC over the ROC sweep: one row
    * (n_pos, n_neg, auc). An all-one-class input reports auc 0.0
    * (undefined — the 0-denominator guard, not a claim). */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).cast("long").as("score"))
      .agg(sum(col(labelCol).cast("long")).as("pos"),
        (count(lit(1)) - sum(col(labelCol).cast("long"))).as("neg"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagW = Window.orderBy(col("score").desc)
    val cum = perScore.select(col("score"),
        sum(col("pos")).over(w).as("tp"), sum(col("neg")).over(w).as("fp"))
      .select(
        (col("fp") - coalesce(lag(col("fp"), 1).over(lagW), lit(0L)))
          .as("dfp"),
        (col("tp") + coalesce(lag(col("tp"), 1).over(lagW), lit(0L)))
          .as("tpsum"))
    val num = cum.agg(
      coalesce(sum(col("dfp") * col("tpsum")), lit(0L)).as("auc_num"))
    val tot = df.agg(sum(col(labelCol).cast("long")).as("n_pos"),
      (count(lit(1)) - sum(col(labelCol).cast("long"))).as("n_neg"))
    tot.crossJoin(broadcast(num))
      .select(col("n_pos"), col("n_neg"), {
        val den = lit(2L) * col("n_pos") * col("n_neg")
        val s = col("auc_num") * lit(1000000L)
        when(den > 0, ((s - pmod(s, den)) / den).cast("double") / 1000000.0)
          .otherwise(lit(0.0)).as("auc")
      })
  }

  /** Spearman rank correlation between two integer score columns —
    * do two quality signals agree enough that one can gate for both?
    * Ranks are made UNIQUE by a deterministic (score, id) tiebreak, so
    * ρ = 1 − 6Σd²/(n(n²−1)) needs no tie correction and every term is an
    * exact integer; the final ρ is computed as (den − 6Σd²)/den — exact
    * decimals into ONE IEEE division, deterministic across engines (only
    * float summation is order-dependent). Output: (n, sum_d2, rho).
    *
    * Scale shape: each rank is a range-partitioned global sort (sampled
    * boundaries — parallel at any corpus size) plus the distributed
    * gapless zipWithIndex; never a corpus-wide one-task row_number
    * window. Σd² shuffles (id, rank) pairs only. */
  def spearman(df: DataFrame, idCol: String, c1: String,
      c2: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(col(idCol), col(c1), col(c2)).localCheckpoint(true)
    def rankBy(c: String, name: String): DataFrame =
      graft.scd2.Historizer.withGaplessIndex(
        base.select(col(idCol), col(c))
          .orderBy(col(c).asc, col(idCol).asc), name)
        .select(col(idCol), col(name))
    val dd = col("__r1") - col("__r2")
    rankBy(c1, "__r1").join(rankBy(c2, "__r2"), idCol)
      .agg(count(lit(1)).as("n"),
        coalesce(sum((dd * dd).cast(dec)), lit(0L).cast(dec)).as("sum_d2"))
      .select(col("n"), col("sum_d2").cast("long").as("sum_d2"), {
        val den = (col("n").cast(dec) * col("n") * col("n") - col("n"))
          .cast(dec)
        when(col("n") > 1,
          (den - lit(6).cast(dec) * col("sum_d2")).cast("double") /
            den.cast("double"))
          .otherwise(lit(0.0)).as("rho")
      })
  }
}
