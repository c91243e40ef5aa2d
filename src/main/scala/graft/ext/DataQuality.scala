package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks + column profiling — the validation
  * layer a training-data pipeline runs before anything downstream trusts
  * a table (the Deequ/Great-Expectations role, rebuilt Spark-first).
  * The reference's only data contract is the SCD2 column-set check
  * (Delta_detection_query_gen.py:308-330, surfaced as Pipeline D8);
  * this module generalizes it to row-level constraints a 100 TB ingest
  * actually needs: completeness, ranges, value domains, key uniqueness,
  * referential integrity.
  *
  * Scale shape: every ROW-level constraint folds into ONE map-side
  * combined aggregate over ONE scan of the table — adding a constraint
  * adds a sum(), not a pass. Uniqueness adds one shuffle of the key
  * columns only (never full rows); referential integrity adds one
  * anti-join on the key column (broadcast when the dimension side is
  * small). The report itself is O(#constraints) rows.
  *
  * Determinism: fractions are 4-decimal fixed-point via integer floor
  * division (the engine-portable idiom used across graft.ext), so the
  * DuckDB oracle reproduces them bit-for-bit.
  */
object DataQuality {

  /** A constraint over a single table. `name` keys the report row. */
  sealed trait Check {
    def name: String
    def target: String
  }
  /** Column must be non-null. */
  final case class Complete(column: String) extends Check {
    val name = "complete"; val target = column
  }
  /** Column must fall in [lo, hi] (nulls count as violations). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    val name = "range"; val target = column
  }
  /** Column must be one of `allowed` (nulls count as violations). */
  final case class InSet(column: String, allowed: Seq[String]) extends Check {
    val name = "in_set"; val target = column
  }
  /** Column must fully match `regex` (RE2-safe subset recommended so the
    * DuckDB oracle agrees; nulls count as violations). */
  final case class MatchesRegex(column: String, regex: String) extends Check {
    val name = "matches"; val target = column
  }
  /** The given columns must be a unique key. A violation is a row in
    * excess of one within a duplicated key group. */
  final case class Unique(columns: Seq[String]) extends Check {
    val name = "unique"; val target = columns.mkString(",")
  }
  /** Every non-null value of `column` must appear in `dimCol` of `dim`.
    * A violation is a row whose key has no match (orphaned fact row). */
  final case class RefIntegrity(column: String, dim: DataFrame,
      dimCol: String, dimName: String) extends Check {
    val name = "ref"; val target = s"$column->$dimName.$dimCol"
  }

  /** True when the row VIOLATES the (row-level) check. A null value
    * fails range/set/regex checks too (three-valued `!null` would
    * silently skip them — coalesce makes the null case explicit). */
  private def violated(c: Check): Column = c match {
    case Complete(col0) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      coalesce(!(col(col0) >= lo && col(col0) <= hi), lit(true))
    case InSet(col0, allowed) =>
      coalesce(!col(col0).isInCollection(allowed), lit(true))
    case MatchesRegex(col0, re) =>
      coalesce(!col(col0).rlike("^(?:" + re + ")$"), lit(true))
    case _ => throw new IllegalArgumentException(s"not row-level: $c")
  }

  /** 4-dp fixed-point fraction of rows passing: (n - viol)/n, floored.
    * Empty table ⇒ vacuously 1.0. */
  private def passFrac(n: Column, viol: Column): Column = {
    val scaled = (n - viol) * lit(10000L)
    when(n > 0,
      ((scaled - pmod(scaled, n)) / n).cast("double") / 10000.0)
      .otherwise(lit(1.0))
  }

  private def reportRow(name: Column, target: Column, n: Column,
      viol: Column): Seq[Column] = Seq(
    name.as("check"), target.as("target"), n.as("n_rows"),
    viol.as("n_violations"), passFrac(n, viol).as("pass_frac"),
    when(viol === 0, lit(1L)).otherwise(lit(0L)).as("passed"))

  /** Run `checks` against `df`; one report row per check:
    * (check, target, n_rows, n_violations, pass_frac, passed).
    *
    * All row-level checks share a single aggregate pass (one scan, no
    * shuffle beyond the final 1-row reduce); each Unique/RefIntegrity
    * check adds its own narrow-column pass as documented above. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty,
      "DataQuality.report needs at least one Check (got an empty list)")
    val rowLevel = checks.collect {
      case c @ (_: Complete | _: InRange | _: InSet | _: MatchesRegex) => c
    }
    val parts = Seq.newBuilder[DataFrame]
    // one shared COUNT(*) plan for every referential branch (they only
    // need the total; no reason to re-derive it per check)
    lazy val totalDf = df.agg(count(lit(1)).as("n"))

    if (rowLevel.nonEmpty) {
      // one scan: count(*) + one conditional sum per row-level check
      // (the same pass partialRowState exposes for sharded runs), then
      // finalize the long-format rows
      parts += partialRowState(df, rowLevel)
        .select(reportRow(col("check"), col("target"),
          col("n_rows"), col("n_violations")): _*)
    }

    checks.collect { case u: Unique => u }.foreach { u =>
      // shuffle carries the key columns only; dup excess is map-side
      // combinable (count per key, then Σ(cnt−1) over the tiny key-count
      // aggregate)
      val keyCols = u.columns.map(col)
      val perKey = df.select(keyCols: _*)
        .groupBy(keyCols: _*).agg(count(lit(1)).as("cnt"))
      val one = perKey.agg(
        coalesce(sum(col("cnt")), lit(0L)).as("n"),
        coalesce(sum(col("cnt") - 1), lit(0L)).as("viol"))
      parts += one.select(reportRow(lit(u.name), lit(u.target),
        col("n"), col("viol")): _*)
    }

    checks.collect { case r: RefIntegrity => r }.foreach { r =>
      // orphan count: anti-join on the single key column (broadcast the
      // dimension's distinct keys when small; Catalyst/AQE picks)
      val keys = df.select(col(r.column).as("k"))
      val dimKeys = r.dim.select(col(r.dimCol).as("k")).distinct()
      val orphans = keys.filter(col("k").isNotNull)
        .join(dimKeys, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("viol"))
      val one = totalDf.crossJoin(broadcast(orphans))
      parts += one.select(reportRow(lit(r.name), lit(r.target),
        col("n"), col("viol")): _*)
    }

    parts.result().reduce(_ unionByName _)
  }

  /** Mergeable partial state for ROW-LEVEL checks: the same single
    * aggregate pass as [[report]], emitted as raw (check, target,
    * n_rows, n_violations) counts for one shard / micro-batch. States
    * merge by ADDITION — sum counts per (check, target) — so a 100 TB
    * validation runs per-shard (or per-micro-batch via a foreachBatch
    * sink keyed the same way, the rollup-sink shape) and folds without
    * rescanning history. [[reportFromStates]] finalizes pass fractions
    * over any union of states. */
  def partialRowState(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val rowLevel = checks.collect {
      case c @ (_: Complete | _: InRange | _: InSet | _: MatchesRegex) => c
    }
    require(rowLevel.nonEmpty, "partialRowState needs row-level checks")
    val aggs = count(lit(1)).as("n") +: rowLevel.zipWithIndex.map {
      case (c, i) =>
        coalesce(sum(when(violated(c), 1L).otherwise(0L)), lit(0L)).as(s"v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(rowLevel.zipWithIndex.map {
      case (c, i) => struct(
        lit(c.name).as("check"), lit(c.target).as("target"),
        col("n").as("n_rows"), col(s"v$i").as("n_violations"))
    }: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.target").as("target"),
        col("r.n_rows").as("n_rows"), col("r.n_violations").as("n_violations"))
  }

  /** Fold any number of partial states into the final report (same
    * schema as [[report]]). Merge = count addition per (check, target) —
    * O(states · checks) rows, metadata-sized at any corpus scale. */
  def reportFromStates(states: DataFrame*): DataFrame = {
    val merged = states.reduce(_ unionByName _)
      .groupBy(col("check"), col("target"))
      .agg(sum(col("n_rows")).as("n"), sum(col("n_violations")).as("viol"))
    merged.select(reportRow(col("check"), col("target"),
      col("n"), col("viol")): _*)
  }

  /** Generic column profiler, long format: one row per (column, metric)
    * with the value rendered as a string. Metrics: n, n_null,
    * n_distinct, min, max. String rendering keeps the report schema
    * uniform across column types; keep profiled columns to
    * integer/varchar types when cross-engine string parity matters
    * (float→string formatting differs between engines).
    *
    * Scale: a single aggregate pass. The multiple exact countDistinct
    * aggregates expand the scan #cols× (Spark's Expand) before one
    * shuffle of (col-tag, value) pairs — the standard exact-profile
    * cost. A 100 TB profile swaps countDistinct for
    * [[Sketches.kmvKeep]] estimates per column (same report shape) when
    * exactness isn't required. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = one.select(explode(array(cols.flatMap { c =>
      Seq(
        struct(lit(c).as("column"), lit("n").as("metric"),
          col("n").cast("string").as("value")),
        struct(lit(c).as("column"), lit("n_null").as("metric"),
          col(s"null_$c").cast("string").as("value")),
        struct(lit(c).as("column"), lit("n_distinct").as("metric"),
          col(s"nd_$c").cast("string").as("value")),
        struct(lit(c).as("column"), lit("min").as("metric"),
          col(s"min_$c").as("value")),
        struct(lit(c).as("column"), lit("max").as("metric"),
          col(s"max_$c").as("value")))
    }: _*)).as("r"))
    rows.select(col("r.column").as("col_name"), col("r.metric").as("metric"),
      col("r.value").as("value"))
  }

  /** Profile drift between two slices of a table (yesterday's load vs
    * today's, upstream vs post-transform): the two [[profileColumns]]
    * reports full-outer-joined on (column, metric) with a null-safe
    * `changed` verdict — the one-page "what moved" diff a pipeline gate
    * reads before promoting a batch. Each side is one aggregate pass;
    * the join input is O(#cols·#metrics), metadata-sized. */
  def profileDrift(oldDf: DataFrame, newDf: DataFrame,
      cols: Seq[String]): DataFrame = {
    val a = profileColumns(oldDf, cols).withColumnRenamed("value", "value_old")
    val b = profileColumns(newDf, cols).withColumnRenamed("value", "value_new")
    a.join(b, Seq("col_name", "metric"), "full_outer")
      .select(col("col_name"), col("metric"), col("value_old"),
        col("value_new"),
        (!(col("value_old") <=> col("value_new"))).as("changed"))
  }
}
