package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributional statistics for corpus audits — the "is this corpus
  * balanced?" battery a release review reads: association between
  * categorical facets (chi-square) and concentration of mass across a
  * facet (Gini). No reference equivalent (its only aggregates are scalar
  * MAXes) — north-star extension surface.
  *
  * Both operators reduce the corpus to a FACET-SIZED aggregate first
  * (one map-side-combined groupBy), then do all statistics on that tiny
  * state — the only shape that survives 100 TB. Scores sit on exact
  * integer lattices (floor fixed-point over decimal(38,0)), never IEEE
  * accumulation, so results hash-match any engine.
  */
object Stats {
  private val dec = "decimal(38,0)"

  /** ⌊num/den⌋ over exact decimals — (num − num mod den)/den is an exact
    * multiple of den, so the decimal division is exact (no scale-6
    * half-up rounding hazard at integer boundaries). */
  private def floorDiv(num: Column, den: Column): Column =
    (num - pmod(num, den)) / den

  /** Pearson chi-square test of independence between two categorical
    * columns (lang × source: "does language depend on provenance?").
    * Returns ONE row of exact sufficient statistics plus the statistic
    * on the q6 lattice:
    *   chi2_q6 = Σ_cells ⌊(O·N − r·c)²·10⁶ / (N·r·c)⌋
    * (the per-cell floor is the DEFINED semantics — both engines sum the
    * same floored integers, where a float Σ(O−E)²/E would hash-flake on
    * accumulation order). Zero-count cells of the full a×b grid are
    * included — they contribute ⌊r·c·10⁶/N⌋ each and dropping them
    * understates the statistic. NULL categories are EXCLUDED up front:
    * a null is "value missing", not a category — and left in, its rows
    * would inflate the margins and N while its observed cells could
    * never match the equality grid join, biasing chi2 upward.
    *
    * Overflow headroom: the ⌊d²·10⁶/den⌋ cell is computed as
    * ⌊d²/den⌋·10⁶ + ⌊(d² mod den)·10⁶/den⌋ — exact, and never forms
    * the d²·10⁶ product — so the binding constraint is d² < 10³⁸,
    * i.e. N ≲ 1.8·10⁹ rows per invocation. Beyond that, apply
    * per-stratum (the statistic on a single 10⁹⁺-row table is
    * statistically degenerate anyway — everything is "significant").
    *
    * Scale shape: one (a,b)-keyed count shuffle (map-side combined);
    * margins derive from the cell table (facet-sized); the full grid is
    * a broadcast cross of the two margin tables — |a|·|b| rows of pure
    * arithmetic. Nothing row-scaled past the first aggregate. */
  def chiSquareIndependence(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val o = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = o.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val cb = o.groupBy(col("b")).agg(sum(col("o")).as("c"))
    val nt = o.agg(sum(col("o")).as("n"))
    val grid = ra.crossJoin(broadcast(cb)).crossJoin(broadcast(nt))
      .join(o, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("r").cast(dec).as("r"),
        col("c").cast(dec).as("c"), col("n").cast(dec).as("n"),
        coalesce(col("o"), lit(0L)).cast(dec).as("o"))
    val diff = grid("o") * grid("n") - grid("r") * grid("c")
    val den = grid("n") * grid("r") * grid("c")
    // ⌊d²·10⁶/den⌋ without the d²·10⁶ product (see the headroom note)
    val sq = diff * diff
    val cell = floorDiv(sq, den) * lit(1000000L).cast(dec) +
      floorDiv(pmod(sq, den) * lit(1000000L).cast(dec), den)
    grid.select(col("a"), col("b"), col("n"), cell.as("cell"))
      .agg(max(col("n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_cells"),
        count_distinct(col("a")).as("n_a"),
        count_distinct(col("b")).as("n_b"),
        sum(col("cell")).cast("long").as("chi2_q6"))
      .select(col("n_rows"), col("n_cells"), col("n_a"), col("n_b"),
        ((col("n_a") - 1L) * (col("n_b") - 1L)).as("dof"),
        col("chi2_q6"))
  }

  /** Pairwise Pearson correlation matrix over lattice-quantized numeric
    * columns: ONE aggregate pass computes every sufficient statistic
    * (n, Σx_i, Σx_i², Σx_i·x_j) exactly in decimal(38,0) — Σx·y passes
    * int64 already at ~10⁵ rows of 10⁷-cent values — then the |cols|²/2
    * correlations are pure projections over that single row, each one
    * shared-text IEEE arithmetic on exact inputs (the discipline of the
    * rolling-correlation window op, lifted to the full matrix).
    *
    * Scale shape: one map-side-combined global aggregate (a dozen
    * decimal sums per partition cross the wire); the pair explosion runs
    * on ONE row. */
  def correlationMatrix(df: DataFrame,
      cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix: need at least two columns")
    val names = cols.map(_._1)
    // LISTWISE deletion: a row with any null value would be counted in n
    // but skipped by the null-ignoring sums — inconsistent sufficient
    // statistics, silently wrong correlations
    val vals = df.select(cols.map { case (n, c) => c.cast(dec).as(n) }: _*)
      .na.drop()
    val pairs = for {
      i <- names.indices; j <- names.indices if i < j
    } yield (names(i), names(j))
    val aggs =
      names.map(n => sum(col(n)).as(s"s_$n")) ++
      names.map(n => sum(col(n) * col(n)).as(s"ss_$n")) ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") }
    val row = vals.agg(count(lit(1)).as("n"), aggs: _*)
    val nD = col("n").cast(dec)
    val pairStructs = pairs.map { case (a, b) =>
      val num = (nD * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
        .cast("double")
      val da = (nD * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a"))
        .cast("double")
      val db = (nD * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))
        .cast("double")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        (num / nullif(sqrt(da) * sqrt(db), lit(0.0))).as("corr"))
    }
    row.select(col("n"), explode(array(pairStructs: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("n"), col("p.corr"))
  }

  /** Per-group ordinary-least-squares fit y ~ x (sensor drift per
    * device, quality trend per source): sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²) are EXACT decimal sums in one
    * map-side-combined groupBy — Σx² of epoch-second x overflows int64
    * at any real volume, hence the decimal lattice — and
    * slope/intercept are shared-text IEEE formulas over those exact
    * inputs. Groups with zero x-variance report null slope (nullif
    * guards the division), matching the oracle. */
  def groupRegression(df: DataFrame, groupCol: String, x: Column,
      y: Column): DataFrame = {
    val stats = df
      .select(col(groupCol), x.cast(dec).as("x"), y.cast(dec).as("y"))
      // listwise deletion — same n-vs-sums consistency argument as the
      // correlation matrix
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    val nD = col("n").cast(dec)
    val slope = (nD * col("sxy") - col("sx") * col("sy")).cast("double") /
      nullif((nD * col("sxx") - col("sx") * col("sx")).cast("double"),
        lit(0.0))
    stats
      .withColumn("slope", slope)
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          col("n"))
      .select(col(groupCol), col("n"), col("slope"), col("intercept"))
  }

  /** Benford's-law expected leading-digit mass, ppm (⌊10⁶·log₁₀(1+1/d)⌋
    * for d = 1..9) — FIXED literals, never computed at runtime (log₁₀ is
    * engine-dependent at the last ulp; a constant table cannot flake).
    * Oracles must derive their copy from this Seq. */
  val benfordPpm: Seq[Long] = Seq(301029L, 176091L, 124938L, 96910L,
    79181L, 66946L, 57991L, 51152L, 45757L)

  /** Benford's-law audit of a positive cents-lattice amount column:
    * observed leading-digit distribution (ppm, floor) next to the
    * expected mass and the signed deviation — the classic fabricated-
    * numbers screen, useful on any money/metric column feeding a
    * training corpus. The leading digit reads off the integer's decimal
    * string (no float log). One map-side-combined 9-group aggregate;
    * digits that never lead are absent (the oracle drops them
    * identically). */
  def benfordAudit(df: DataFrame, cents: Column): DataFrame = {
    val expected = map(benfordPpm.zipWithIndex.flatMap { case (p, i) =>
      Seq(lit(i + 1L), lit(p))
    }: _*)
    val digit = substring(cents.cast("string"), 1, 1).cast("long")
    val counts = df.filter(cents > 0L)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("n_total"))
    val scaled = col("n").cast(dec) * lit(1000000L).cast(dec)
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"), col("n_total"),
        floorDiv(scaled, col("n_total").cast(dec)).cast("long").as("obs_ppm"),
        element_at(expected, col("digit")).as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
  }

  /** Gini coefficient of row-count concentration across a facet (docs
    * per source: 0 = perfectly balanced corpus, →1 = one source owns
    * everything). Exact rational on the q6 lattice over ascending-count
    * ranks i = 1..n:
    *   gini_q6 = ⌊(2·Σ i·x_i − (n+1)·Σx)·10⁶ / (n·Σx)⌋.
    * The rank window is GLOBAL but runs over the facet-sized count table
    * (bounded by |distinct groups|, never by rows — the same
    * bounded-lattice frame discipline as the Eval ROC sweep). Ties on
    * count break by group name, so the rank — and the statistic — is a
    * total order in any engine. */
  def giniConcentration(df: DataFrame, groupCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("x"))
    val ranked = g.withColumn("i",
      row_number().over(Window.orderBy(col("x"), col("g"))))
    ranked
      .agg(count(lit(1)).as("n_groups"),
        sum(col("x")).as("n_total"),
        sum(col("i").cast(dec) * col("x").cast(dec)).as("six"))
      .select(col("n_groups"), col("n_total"),
        floorDiv(
          (lit(2L).cast(dec) * col("six") -
            (col("n_groups") + 1L).cast(dec) * col("n_total").cast(dec)) *
            lit(1000000L).cast(dec),
          col("n_groups").cast(dec) * col("n_total").cast(dec))
          .cast("long").as("gini_q6"))
  }

  /** Histogram drift per group: the TOTAL-VARIATION distance between
    * two slices' distributions of a bucketed value — the drift metric a
    * continuous quality filter monitors across crawl snapshots. TVD is
    * chosen over PSI/KL because ½·Σ|p−q| reduces to ONE integer floor
    * division, tvd_q4 = ⌊10⁴·Σ|aᵢ·nb − bᵢ·na| / (2·na·nb)⌋, with every
    * product exact in decimal(38,0) — `ln` would hash-flake across
    * engines. `sliceCol` must be 0/1; `binCol` any discrete bucket.
    * One pass to (group, bin, slice) counts (map-side combined);
    * everything after is facet-sized, per-group totals broadcast. A
    * group present in only one slice reports the maximal drift 1. */
  def histogramDrift(df: DataFrame, groupCol: String, sliceCol: String,
      binCol: String): DataFrame =
    driftTail(df.groupBy(col(groupCol), col(binCol))
      .agg(sum(when(col(sliceCol) === 0L, 1L).otherwise(0L)).as("a"),
        sum(when(col(sliceCol) === 1L, 1L).otherwise(0L)).as("b")),
      groupCol)

  /** [[histogramDrift]] over two PRE-AGGREGATED count frames
    * (groupCol, binCol, nCol) — the form a standing monitor holds:
    * slice a = the stream's accumulated histogram, slice b = the frozen
    * reference. Same exact q4 lattice and output contract; a group
    * present in only one frame reports the maximal drift 1. */
  def histogramDriftFromCounts(a: DataFrame, b: DataFrame,
      groupCol: String, binCol: String, nCol: String): DataFrame =
    driftTail(
      a.select(col(groupCol), col(binCol), col(nCol).as("a"),
          lit(0L).as("b"))
        .unionByName(b.select(col(groupCol), col(binCol),
          lit(0L).as("a"), col(nCol).as("b")))
        .groupBy(col(groupCol), col(binCol))
        .agg(sum(col("a")).as("a"), sum(col("b")).as("b")),
      groupCol)

  /** Shared TVD tail over a (group, bin, a, b) count frame. */
  private def driftTail(counts: DataFrame, groupCol: String): DataFrame = {
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    val num = abs(col("a").cast(dec) * col("nb").cast(dec) -
      col("b").cast(dec) * col("na").cast(dec))
    counts.join(broadcast(totals), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(first(col("na")).as("n_a"), first(col("nb")).as("n_b"),
        sum(num).as("s"))
      .select(col(groupCol), col("n_a"), col("n_b"), {
        val den = lit(2L).cast(dec) * col("n_a").cast(dec) *
          col("n_b").cast(dec)
        val scaled = col("s").cast(dec) * lit(10000L).cast(dec)
        when(col("n_a") > 0L && col("n_b") > 0L,
          floorDiv(scaled, den).cast("double") / 10000.0)
          .otherwise(lit(1.0)).as("tvd")
      })
  }
}
