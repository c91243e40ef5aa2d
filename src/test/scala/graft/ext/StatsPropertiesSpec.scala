package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic invariants of the Stats family on seeded random inputs —
  * the properties that must hold for ANY data, complementing the
  * hand-value tests in StatsSpec. */
class StatsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(42)
  private val facets =
    Seq.fill(400)((s"a${rng.nextInt(4)}", s"b${rng.nextInt(5)}"))

  test("chi2 is symmetric in its arguments and invariant to category renaming") {
    val df = facets.toDF("a", "b")
    val ab = Stats.chiSquareIndependence(df, "a", "b").collect().head
    val ba = Stats.chiSquareIndependence(df, "b", "a").collect().head
    assert(ab.getAs[Long]("chi2_q6") === ba.getAs[Long]("chi2_q6"))
    assert(ab.getAs[Long]("dof") === ba.getAs[Long]("dof"))
    // bijective relabeling of one facet cannot move the statistic
    val renamed = df.withColumn("a", concat(lit("zz_"), col("a")))
    val r = Stats.chiSquareIndependence(renamed, "a", "b").collect().head
    assert(r.getAs[Long]("chi2_q6") === ab.getAs[Long]("chi2_q6"))
  }

  test("chi2 null rows are excluded entirely (margins AND total)") {
    val df = facets.toDF("a", "b")
    val withNulls = df.unionByName(
      Seq((null.asInstanceOf[String], "b0"), ("a0", null.asInstanceOf[String]))
        .toDF("a", "b"))
    val clean = Stats.chiSquareIndependence(df, "a", "b").collect().head
    val dirty = Stats.chiSquareIndependence(withNulls, "a", "b").collect().head
    assert(dirty.getAs[Long]("n_rows") === clean.getAs[Long]("n_rows"))
    assert(dirty.getAs[Long]("chi2_q6") === clean.getAs[Long]("chi2_q6"))
  }

  test("gini is invariant to group relabeling and to row order") {
    val rows = Seq.fill(300)(s"g${rng.nextInt(7)}")
    val base = Stats.giniConcentration(rows.toDF("g"), "g")
      .collect().head.getAs[Long]("gini_q6")
    val relabeled = Stats.giniConcentration(
      rows.map("x" + _).toDF("g"), "g").collect().head.getAs[Long]("gini_q6")
    val shuffled = Stats.giniConcentration(
      rng.shuffle(rows).toDF("g"), "g").collect().head.getAs[Long]("gini_q6")
    assert(relabeled === base)
    assert(shuffled === base)
  }

  test("correlation matrix is invariant to row order; corr bounded in [-1,1]") {
    val rows = Seq.fill(200)((rng.nextInt(1000).toLong,
      rng.nextInt(1000).toLong, rng.nextInt(1000).toLong))
    def run(rs: Seq[(Long, Long, Long)]) =
      Stats.correlationMatrix(rs.toDF("x", "y", "z"),
        Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getAs[Double]("corr")).toMap
    val a = run(rows)
    val b = run(rng.shuffle(rows))
    assert(a === b)
    a.values.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
  }

  test("regression slope is invariant under y-shift; shift moves only the intercept") {
    val rows = (1L to 100L).map(i =>
      ("g", i, 3 * i + rng.nextInt(10).toLong))
    val base = Stats.groupRegression(rows.toDF("g", "x", "y"), "g",
      col("x"), col("y")).collect().head
    val shifted = Stats.groupRegression(
      rows.map { case (g, x, y) => (g, x, y + 1000L) }.toDF("g", "x", "y"),
      "g", col("x"), col("y")).collect().head
    assert(base.getAs[Double]("slope") === shifted.getAs[Double]("slope"))
    assert(math.abs(
      shifted.getAs[Double]("intercept") - base.getAs[Double]("intercept")
        - 1000.0) < 1e-6)
  }
}
