package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** BLEU-style modified n-gram precision over CANDIDATE PAIRS — the
    * grader that turns a near-dup candidate list into an interpretable
    * overlap score (Papineni et al. 2002's clipped-count precision,
    * directed a→b): for each pair, p_n = Σ_g min(c_a(g), c_b(g)) /
    * Σ_g c_a(g) over word n-grams, reported for n=1 and n=2 on the
    * 10⁻⁶ floor lattice (integer counts in, integer floor-division out
    * — both engines hash-agree).
    *
    * Scale shape: the per-doc gram-count index is built ONCE per order
    * (explode + one map-side-combined groupBy), checkpointed, and
    * joined to the pair list from both sides — the same postings-index
    * shape as [[Dedup.jaccardFor]]; the pair list bounds all downstream
    * work, so cost is O(pairs · grams-per-doc), never corpus². A doc
    * with no grams (shorter than n words) scores 0, not null. */
  def ngramPrecision(pairsIn: DataFrame, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // the pair list feeds four joins; without this a generator like
    // minhashNearDups would re-run its whole LSH pipeline per branch
    // (pair lists are near-dup-sized, bounded ≪ corpus)
    val pairs = pairsIn.localCheckpoint(true)
    // only pair-member docs contribute to any output row, so the gram
    // index never needs the rest of the corpus: a semi-join against the
    // (≤ 2·pairs)-row id list prunes the explode+aggregate to the docs
    // under grading — O(pairs · grams-per-doc) end to end instead of a
    // corpus-wide gram aggregate feeding a pair-bounded join (r13 gate:
    // the corpus term dominated q_eval_ngram_overlap's 8 s)
    val pairDocs = docs.join(
      pairs.select(col("id_a").as(idCol))
        .unionByName(pairs.select(col("id_b").as(idCol))).distinct(),
      Seq(idCol), "left_semi")
    val ws = Hashing.words(col(textCol))
    def gramIndex(n: Int): DataFrame = pairDocs
      .select(col(idCol).as("id"),
        explode(Hashing.ngrams(ws, n)).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds a-side, b-side, and totals
    def precision(n: Int, tag: String): DataFrame = {
      val idx = gramIndex(n)
      val tot = idx.groupBy(col("id").as("id_a"))
        .agg(sum(col("cnt")).as(s"tot$tag"))
      val clip = pairs
        .join(idx.select(col("id").as("id_a"), col("gram"),
          col("cnt").as("ca")), "id_a")
        .join(idx.select(col("id").as("id_b"), col("gram"),
          col("cnt").as("cb")), Seq("id_b", "gram"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(least(col("ca"), col("cb"))).as(s"clip$tag"))
      pairs.join(tot, Seq("id_a"), "left")
        .join(clip, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"),
          coalesce(col(s"clip$tag"), lit(0L)).as(s"clip$tag"),
          coalesce(col(s"tot$tag"), lit(0L)).as(s"tot$tag"))
    }
    def ppm(num: Column, den: Column): Column = {
      val s = num * lit(1000000L)
      when(den > 0, ((s - pmod(s, den)) / den).cast("long"))
        .otherwise(lit(0L))
    }
    precision(1, "1").join(precision(2, "2"), Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"),
        col("clip1"), col("tot1"), ppm(col("clip1"), col("tot1")).as("p1_ppm"),
        col("clip2"), col("tot2"), ppm(col("clip2"), col("tot2")).as("p2_ppm"))
  }

  /** Fleiss' kappa (Fleiss 1971): chance-corrected agreement for n ≥ 2
    * raters per item — the multi-annotator complement to the Cohen's
    * kappa already in the registry (which only handles rater PAIRS).
    * A labeling pipeline uses it to decide whether an ensemble of cheap
    * annotators (heuristics, weak models) agrees enough to trust
    * majority vote.
    *
    * Exactness: with S1 = Σ_items (Σ_cat n_ic² − n) and S2 = Σ_cat c_c²
    * (c_c the category marginal), κ = (P̄−P̄e)/(1−P̄e) reduces to the
    * all-integer form
    *   κ = (n·N·S1 − (n−1)·S2) / ((n−1)·((nN)² − S2))
    * — every term exact in decimal(38,0) ((nN)² overflows int64 past
    * ~10⁹ items), one final IEEE division of exact integers. Degenerate
    * single-category corpora (denominator 0) report 0.
    *
    * Scale shape: one unpivot scan → (item, category) counts (map-side
    * combined), a per-item Σn² aggregate, a category-marginal aggregate
    * over the lattice-sized (category) relation, then 1-row broadcasts
    * — nothing scales beyond the first shuffle of (item, cat) pairs. */
  def fleissKappa(ratings: DataFrame, itemCol: String,
      raterCols: Seq[String]): DataFrame = {
    val dec = "decimal(38,0)"
    val n = raterCols.size
    require(n >= 2, "fleissKappa needs at least two raters")
    val long = ratings.select(col(itemCol).as("item"),
      explode(array(raterCols.map(col): _*)).as("cat"))
    val cells = long.groupBy(col("item"), col("cat"))
      .agg(count(lit(1)).as("nic")).localCheckpoint(true)
    val s1 = cells.groupBy(col("item"))
      .agg((sum(col("nic") * col("nic")) - lit(n.toLong)).as("pi"))
      .agg(coalesce(sum(col("pi").cast(dec)), lit(0).cast(dec)).as("s1"),
        count(lit(1)).as("n_items"))
    val s2 = cells.groupBy(col("cat"))
      .agg(sum(col("nic")).as("cc"))
      .agg(coalesce(sum((col("cc") * col("cc")).cast(dec)),
        lit(0).cast(dec)).as("s2"))
    s1.crossJoin(broadcast(s2))
      .select(col("n_items"), lit(n.toLong).as("n_raters"),
        col("s1").cast("long").as("s1"), col("s2").cast("long").as("s2"), {
          val nn = col("n_items").cast(dec) * lit(n)
          val num = nn * col("s1") - lit(n - 1).cast(dec) * col("s2")
          val den = lit(n - 1).cast(dec) * (nn * nn - col("s2"))
          when(den > 0, num.cast("double") / den.cast("double"))
            .otherwise(lit(0.0)).as("kappa")
        })
  }

  /** Self-overlap corpus diversity (the self-BLEU readout of Zhu et al.
    * 2018, made deterministic): per stratum, the mean clipped-bigram
    * precision over a HASH-BUCKET pair sample — docs land in
    * `buckets` buckets by id hash inside each stratum, each non-trivial
    * bucket contributes its (min id, max id) pair, and
    * [[ngramPrecision]] grades the sample. High mean overlap = a
    * templated, low-diversity stratum; the readout that catches a
    * boilerplate-heavy source before it floods a mixture.
    *
    * The pair sample is O(strata · buckets) by construction — never a
    * per-stratum window and never corpus pairs; `buckets` is the sample
    * size knob a 100 TB run scales independently of corpus size. */
  def selfOverlap(docs: DataFrame, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text",
      stratumCol: String = "source"): DataFrame = {
    require(buckets > 0, "selfOverlap: buckets must be positive")
    val assigned = docs.select(col(stratumCol).as("stratum"),
      col(idCol).as("id"),
      pmod(Hashing.hexInt(col(idCol).cast("string")), lit(buckets.toLong))
        .as("bkt"))
    val pairs = assigned.groupBy(col("stratum"), col("bkt"))
      .agg(min(col("id")).as("id_a"), max(col("id")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .localCheckpoint(true) // feeds the grader AND the stratum re-join
    val scored = ngramPrecision(pairs.select(col("id_a"), col("id_b")),
      docs, idCol, textCol)
    scored.join(pairs.select(col("stratum"), col("id_a"), col("id_b")),
        Seq("id_a", "id_b"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("p1_ppm")).as("s1"), sum(col("p2_ppm")).as("s2"))
      .select(col("stratum"), col("n_pairs"),
        meanPpmFloor(col("s1"), col("n_pairs")).as("self_bleu1_ppm"),
        meanPpmFloor(col("s2"), col("n_pairs")).as("self_bleu2_ppm"))
  }

  /** ⌊s/n⌋ for non-negative lattice sums — exact on both engines. */
  private def meanPpmFloor(s: Column, n: Column): Column =
    ((s - pmod(s, n)) / n).cast("long")

  /** ROUGE-L (Lin 2004) at SENTENCE granularity over candidate pairs:
    * longest common SUBSEQUENCE of the two docs' sentence streams —
    * order-aware overlap that n-gram precision can't see (a reshuffled
    * page keeps its n-grams but loses its sentence order). Sentences
    * hash to 32-bit ints first, so the DP compares longs, not strings.
    *
    * The full LCS dynamic program runs INSIDE a higher-order `aggregate`
    * pair (outer over doc-a sentences carrying the DP row, inner
    * building each new row left-to-right) — per-row array work on
    * sentence-count-sized arrays, no UDF, no extra shuffle; the oracle
    * replicates it with DuckDB's list_reduce. Cost is O(pairs · sa·sb)
    * where sa/sb are SENTENCE counts (tens) — pair-list-bounded, never
    * corpus².
    *
    * Output per pair: sentence counts, lcs, and precision/recall/F1 on
    * the ppm floor lattice (p = lcs/|a|, r = lcs/|b|, f = 2pr/(p+r)). */
  def rougeL(pairsIn: DataFrame, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pairs = pairsIn.localCheckpoint(true)
    // pair-member docs only, as in [[ngramPrecision]]: the sentence
    // split+hash pass is pruned by a semi-join before it runs
    val pairDocs = docs.join(
      pairs.select(col("id_a").as(idCol))
        .unionByName(pairs.select(col("id_b").as(idCol))).distinct(),
      Seq(idCol), "left_semi")
    val sents = pairDocs.select(col(idCol).as("id"),
        transform(TextAnalysis.sentences(col(textCol)),
          s => Hashing.hexInt(s)).as("sh"))
      .localCheckpoint(true) // one sentence+hash pass feeds both sides
    val joined = pairs
      .join(sents.select(col("id").as("id_a"), col("sh").as("sa")), "id_a")
      .join(sents.select(col("id").as("id_b"), col("sh").as("sb")), "id_b")
    val la = size(col("sa"))
    val lb = size(col("sb"))
    // DP row init: lb+1 zeros. Inner positions run max(lb,1) so the
    // sequence() never descends; the lb=0 probe reads element_at past
    // the array end → null, which greatest() ignores (row stays 0) and
    // the final guard zeroes anyway.
    val zeroRow = array_repeat(lit(0), lb + lit(1))
    val dp = aggregate(col("sa"), zeroRow, (row, av) =>
      aggregate(sequence(lit(1), greatest(lb, lit(1))), array(lit(0)),
        (nr, j) => concat(nr, array(greatest(
          element_at(nr, lit(-1)),
          element_at(row, j + lit(1)),
          element_at(row, j) +
            when(element_at(col("sb"), j) === av, lit(1))
              .otherwise(lit(0)))))))
    val lcs = when(la > 0 && lb > 0, element_at(dp, lit(-1)))
      .otherwise(lit(0)).cast("long")
    def ppmOf(num: Column, den: Column): Column = {
      val s = num * lit(1000000L)
      when(den > 0, ((s - pmod(s, den)) / den).cast("long"))
        .otherwise(lit(0L))
    }
    joined
      .select(col("id_a"), col("id_b"),
        la.cast("long").as("n_sent_a"), lb.cast("long").as("n_sent_b"),
        lcs.as("lcs"))
      .select(col("id_a"), col("id_b"), col("n_sent_a"), col("n_sent_b"),
        col("lcs"),
        ppmOf(col("lcs"), col("n_sent_a")).as("p_ppm"),
        ppmOf(col("lcs"), col("n_sent_b")).as("r_ppm"))
      .withColumn("f_ppm",
        when(col("p_ppm") + col("r_ppm") > 0,
          (lit(2L) * col("p_ppm") * col("r_ppm") -
            pmod(lit(2L) * col("p_ppm") * col("r_ppm"),
              col("p_ppm") + col("r_ppm"))) /
            (col("p_ppm") + col("r_ppm")))
          .otherwise(lit(0.0)).cast("long"))
  }
}
