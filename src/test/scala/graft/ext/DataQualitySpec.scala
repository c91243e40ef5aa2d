package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.DataQuality._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1L, 10.0, "A"), (2L, 60.0, "A"), (3L, 5.0, "X"),
    (4L, 20.0, null.asInstanceOf[String]), (4L, 30.0, "N"))
    .toDF("k", "v", "flag")
  private def dim = Seq(1L, 2L, 4L).toDF("dk")

  private def row(df: org.apache.spark.sql.DataFrame, check: String,
      target: String) =
    df.filter(col("check") === check && col("target") === target)
      .collect().head

  test("row-level checks share one report with exact violation counts") {
    val rep = DataQuality.report(facts, Seq(
      Complete("flag"),
      InRange("v", 0.0, 50.0),
      InSet("flag", Seq("A", "N")),
      MatchesRegex("flag", "[A-Z]")))
    assert(rep.count() === 4)
    val c = row(rep, "complete", "flag")
    assert(c.getAs[Long]("n_rows") === 5 && c.getAs[Long]("n_violations") === 1)
    assert(c.getAs[Double]("pass_frac") === 0.8 && c.getAs[Long]("passed") === 0)
    val r = row(rep, "range", "v")
    assert(r.getAs[Long]("n_violations") === 1) // 60.0
    val s = row(rep, "in_set", "flag")
    assert(s.getAs[Long]("n_violations") === 2) // "X" + null
    val m = row(rep, "matches", "flag")
    assert(m.getAs[Long]("n_violations") === 1) // "X" matches [A-Z]; only null violates
  }

  test("uniqueness counts rows in excess of one per key") {
    val rep = DataQuality.report(facts, Seq(Unique(Seq("k"))))
    val u = row(rep, "unique", "k")
    assert(u.getAs[Long]("n_rows") === 5)
    assert(u.getAs[Long]("n_violations") === 1) // k=4 twice
    assert(u.getAs[Long]("passed") === 0)
  }

  test("referential integrity counts orphaned fact rows") {
    val rep = DataQuality.report(facts,
      Seq(RefIntegrity("k", dim, "dk", "dim")))
    val r = row(rep, "ref", "k->dim.dk")
    assert(r.getAs[Long]("n_violations") === 1) // k=3 has no dim row
    assert(r.getAs[Long]("n_rows") === 5)
  }

  test("a clean table passes every check; an empty table is vacuous") {
    val clean = Seq((1L, 10.0, "A"), (2L, 20.0, "N")).toDF("k", "v", "flag")
    val rep = DataQuality.report(clean, Seq(
      Complete("flag"), InRange("v", 0.0, 50.0), Unique(Seq("k")),
      RefIntegrity("k", dim, "dk", "dim")))
    assert(rep.filter(col("passed") === 0).count() === 0)
    assert(rep.filter(col("pass_frac") =!= 1.0).count() === 0)

    val empty = clean.filter(lit(false))
    val repE = DataQuality.report(empty, Seq(Complete("flag"), Unique(Seq("k"))))
    assert(repE.filter(col("passed") === 0).count() === 0)
    assert(repE.filter(col("n_rows") =!= 0L).count() === 0)
  }

  test("profileColumns emits n/n_null/n_distinct/min/max per column") {
    val p = DataQuality.profileColumns(facts, Seq("k", "flag"))
    assert(p.count() === 10)
    val m = p.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(m(("k", "n")) === "5")
    assert(m(("k", "n_null")) === "0")
    assert(m(("k", "n_distinct")) === "4")
    assert(m(("k", "min")) === "1" && m(("k", "max")) === "4")
    assert(m(("flag", "n_null")) === "1")
    assert(m(("flag", "n_distinct")) === "3")
    assert(m(("flag", "min")) === "A" && m(("flag", "max")) === "X")
  }
}
