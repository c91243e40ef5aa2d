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
}
