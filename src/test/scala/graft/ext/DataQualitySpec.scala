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

  test("an empty check list is rejected with a clear message (ADVICE r10)") {
    val clean = Seq((1L, 10.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      DataQuality.report(clean, Seq.empty)
    }
    assert(e.getMessage.contains("at least one Check"))
  }

  test("partial row states merge by addition: shards == full recompute") {
    val checks = Seq[Check](Complete("flag"), InRange("v", 0.0, 50.0),
      InSet("flag", Seq("A", "N")))
    val half1 = facts.filter(col("k") <= 2)
    val half2 = facts.filter(col("k") > 2)
    val merged = DataQuality.reportFromStates(
      DataQuality.partialRowState(half1, checks),
      DataQuality.partialRowState(half2, checks))
    val full = DataQuality.report(facts, checks)
    assert(merged.collect().toSet === full.collect().toSet)
  }

  test("classifier evaluate: perfect predictions score 1.0, misses split P/R") {
    import graft.ext.Classifier
    val truth = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("doc_id", "label")
    val perfect = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("doc_id", "predicted")
    val e1 = Classifier.evaluate(perfect, truth).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(e1("a").getAs[Double]("precision") === 1.0)
    assert(e1("a").getAs[Double]("recall") === 1.0)
    assert(e1("b").getAs[Double]("f1") === 1.0)

    // doc 2 mispredicted b, doc 4 unpredicted (null)
    val partial = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("b")),
      (4L, None: Option[String])).toDF("doc_id", "predicted")
    val e2 = Classifier.evaluate(partial, truth).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(e2("a").getAs[Long]("tp") === 1)
    assert(e2("a").getAs[Long]("n_predicted") === 1)
    assert(e2("a").getAs[Double]("precision") === 1.0)
    assert(e2("a").getAs[Double]("recall") === 0.5)
    assert(e2("b").getAs[Long]("n_predicted") === 2)
    assert(e2("b").getAs[Double]("precision") === 0.5)
    assert(e2("b").getAs[Double]("recall") === 0.5)
    // f1 exact rational: 2*1/(2+2) = 0.5, not a float composition
    assert(e2("b").getAs[Double]("f1") === 0.5)
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

  test("profileDrift: null-safe changed verdict per (column, metric)") {
    val old = Seq((1L, "A"), (2L, "B")).toDF("k", "flag")
    val nw = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "flag")
    val d = DataQuality.profileDrift(old, nw, Seq("k", "flag")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getString(2), r.getString(3), r.getBoolean(4)))).toMap
    assert(d(("k", "n")) === (("2", "3", true)))
    assert(d(("k", "min")) === (("1", "1", false)))
    assert(d(("k", "max")) === (("2", "3", true)))
    assert(d(("flag", "n_null")) === (("0", "0", false)))
    assert(d(("flag", "max")) === (("B", "C", true)))
    assert(d.size === 10)
  }
}
