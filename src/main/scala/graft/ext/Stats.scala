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
    * understates the statistic.
    *
    * Scale shape: one (a,b)-keyed count shuffle (map-side combined);
    * margins derive from the cell table (facet-sized); the full grid is
    * a broadcast cross of the two margin tables — |a|·|b| rows of pure
    * arithmetic. Nothing row-scaled past the first aggregate. */
  def chiSquareIndependence(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val o = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
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
    val cell = floorDiv(diff * diff * lit(1000000L).cast(dec),
      grid("n") * grid("r") * grid("c"))
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
}
