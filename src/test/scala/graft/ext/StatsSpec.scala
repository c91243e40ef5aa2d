package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("chi2: independent facets score ~0, margins and dof are exact") {
    // perfectly independent 2×2: every (a,b) cell has the same count,
    // so O·N = r·c exactly in every cell → chi2_q6 = 0
    val rows = for {
      a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5
    } yield (a, b)
    val out = Stats.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(out.getAs[Long]("n_rows") === 20L)
    assert(out.getAs[Long]("n_cells") === 4L)
    assert(out.getAs[Long]("dof") === 1L)
    assert(out.getAs[Long]("chi2_q6") === 0L)
  }

  test("chi2: perfect association hits the n·dof ceiling; zero cells counted") {
    // diagonal 2×2 (x↔u, y↔v), 10 rows each: chi2 = N = 20 exactly,
    // and the two EMPTY off-diagonal cells contribute r·c/N each —
    // dropping them would halve the statistic
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v"))
    val out = Stats.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(out.getAs[Long]("n_cells") === 4L)
    assert(out.getAs[Long]("chi2_q6") === 20L * 1000000L)
  }

  test("gini: balanced mass scores 0, extreme concentration approaches 1") {
    val balanced = (1 to 4).flatMap(g => Seq.fill(25)(s"g$g")).toDF("g")
    val b = Stats.giniConcentration(balanced, "g").collect().head
    assert(b.getAs[Long]("n_groups") === 4L)
    assert(b.getAs[Long]("n_total") === 100L)
    assert(b.getAs[Long]("gini_q6") === 0L)

    // one group owns 97 of 100 rows, three own 1 each:
    // sorted x = [1,1,1,97]; Σi·x = 1+2+3+388 = 394
    // gini_q6 = ⌊(2·394 − 5·100)·10⁶ / (4·100)⌋ = ⌊288e6/400⌋ = 720000
    val skewed = (Seq.fill(97)("big") ++ Seq("a", "b", "c")).toDF("g")
    val s = Stats.giniConcentration(skewed, "g").collect().head
    assert(s.getAs[Long]("gini_q6") === 720000L)
  }

  test("gini: single group is perfectly concentrated yet scores 0 (n=1 degenerate)") {
    // with one group the Lorenz curve IS the diagonal: ⌊(2·x − 2·x)·10⁶/x⌋ = 0
    val one = Seq.fill(7)("only").toDF("g")
    assert(Stats.giniConcentration(one, "g").collect()
      .head.getAs[Long]("gini_q6") === 0L)
  }

  test("correlation matrix: exact +1/-1 on linear columns, null on constants") {
    val df = (1L to 50L).map(i => (i, 3 * i, -2 * i + 100, 7L))
      .toDF("a", "b", "c", "k")
    val out = Stats.correlationMatrix(df, Seq(
      "a" -> col("a"), "b" -> col("b"), "c" -> col("c"), "k" -> col("k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // sqrt(da)·sqrt(db) is 1 ulp off num for perfectly linear columns —
    // deterministic (the oracle computes the identical double), just not
    // the mathematical ±1 exactly
    assert(math.abs(out(("a", "b")).get - 1.0) < 1e-12)
    assert(math.abs(out(("a", "c")).get + 1.0) < 1e-12)
    assert(out(("a", "k")) === None) // zero variance -> null, not NaN
    assert(out.size === 6)
  }

  test("group regression recovers a planted exact line; zero-variance x is null") {
    val line = (0L to 20L).map(i => ("g1", i, 2 * i + 3))
    val flat = Seq(("g2", 5L, 1L), ("g2", 5L, 9L))
    val out = Stats.groupRegression(
      (line ++ flat).toDF("g", "x", "y"), "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out("g1") === ((21L, Some(2.0), Some(3.0))))
    assert(out("g2")._2 === None) // all x equal -> slope undefined
  }

  test("benford audit: observed ppm floors, fixed expected table, signed deviation") {
    // 30 values leading with 1, 10 with 2; zero/negative amounts dropped
    val cents = (Seq.fill(30)(123L) ++ Seq.fill(10)(250L) ++ Seq(0L, -5L))
    val out = Stats.benfordAudit(cents.toDF("c"), col("c"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) === ((30L, 750000L, 301029L, 448971L)))
    assert(out(2L) === ((10L, 250000L, 176091L, 73909L)))
    assert(out.size === 2) // digits that never lead are absent
  }

  test("histogram drift: hand TVD lattice, identical/disjoint/one-slice groups") {
    // g_same: identical distributions across slices → TVD 0
    // g_disj: disjoint bins → TVD 1
    // g_half: slice0 = {b0:2, b1:2}, slice1 = {b0:1, b1:3}
    //   → ½(|2/4−1/4| + |2/4−3/4|) = 1/4 → 0.25 exactly on the lattice
    // g_only: present in slice 0 only → maximal drift 1 by convention
    val rows =
      Seq.tabulate(4)(i => ("g_same", i.toLong / 2, i.toLong % 2)) ++
      Seq(("g_disj", 0L, 0L), ("g_disj", 0L, 0L),
        ("g_disj", 1L, 1L), ("g_disj", 1L, 1L)) ++
      Seq(("g_half", 0L, 0L), ("g_half", 0L, 0L),
        ("g_half", 0L, 1L), ("g_half", 0L, 1L),
        ("g_half", 1L, 0L), ("g_half", 1L, 1L),
        ("g_half", 1L, 1L), ("g_half", 1L, 1L)) ++
      Seq(("g_only", 0L, 0L))
    val out = Stats.histogramDrift(
        rows.toDF("g", "slice", "bin"), "g", "slice", "bin")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("g_same") === ((2L, 2L, 0.0)))
    assert(out("g_disj") === ((2L, 2L, 1.0)))
    assert(out("g_half") === ((4L, 4L, 0.25)))
    assert(out("g_only") === ((1L, 0L, 1.0)))
  }

  test("histogramDriftFromCounts equals histogramDrift on the same data") {
    import org.apache.spark.sql.functions._
    val df = Seq(("s1", 0L, 1L), ("s1", 0L, 2L), ("s1", 1L, 2L),
      ("s2", 0L, 1L), ("s2", 1L, 3L), ("s3", 0L, 1L))
      .toDF("g", "slice", "bin")
    val want = Stats.histogramDrift(df, "g", "slice", "bin").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val a = df.filter(col("slice") === 0L).groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val b = df.filter(col("slice") === 1L).groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val got = Stats.histogramDriftFromCounts(a, b, "g", "bin", "n")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === want)
    assert(got("s3") === ((1L, 0L, 1.0))) // one-sided group: maximal drift
  }
}
