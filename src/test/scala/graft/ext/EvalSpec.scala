package graft.ext

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  // scores 4,3,2,1 with labels 1,1,0,1 → sweep (desc):
  //   t=4: tp=1 fp=0 | t=3: tp=2 fp=0 | t=2: tp=2 fp=1 | t=1: tp=3 fp=1
  private def scored = Seq(
    (4L, 1L), (3L, 1L), (2L, 0L), (1L, 1L)).toDF("score", "y")

  test("rocPoints: exact cumulative counts and floored rates") {
    val got = Eval.rocPoints(scored, "score", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).sortBy(-_._1)
    assert(got === Seq(
      (4L, 1L, 0L, 2L, 1L, 0.333333, 0.0),
      (3L, 2L, 0L, 1L, 1L, 0.666666, 0.0),
      (2L, 2L, 1L, 1L, 0L, 0.666666, 1.0),
      (1L, 3L, 1L, 0L, 0L, 1.0, 1.0)))
  }

  test("auc: exact trapezoid over merged-tie points") {
    // trapezoid: Δfp steps only at t=2 (Δfp=1, tp_i+tp_{i-1}=4)
    // → auc_num=4, den=2·P·N=2·3·1=6 → auc=floor(4e6/6)/1e6=0.666666
    val got = Eval.auc(scored, "score", "y").collect().head
    assert((got.getLong(0), got.getLong(1), got.getDouble(2)) ===
      ((3L, 1L, 0.666666)))
  }

  test("auc: perfect and inverted rankers hit 1.0 and 0.0; degenerate labels report 0") {
    val perfect = Seq((5L, 1L), (4L, 1L), (1L, 0L), (0L, 0L))
      .toDF("score", "y")
    assert(Eval.auc(perfect, "score", "y").collect().head.getDouble(2) === 1.0)
    val inverted = perfect.select($"score", (org.apache.spark.sql.functions
      .lit(1L) - $"y").as("y"))
    assert(Eval.auc(inverted, "score", "y").collect().head.getDouble(2) === 0.0)
    val onlyPos = Seq((2L, 1L), (1L, 1L)).toDF("score", "y")
    assert(Eval.auc(onlyPos, "score", "y").collect().head.getDouble(2) === 0.0)
  }

  test("rocPoints: score ties merge into one point") {
    val tied = Seq((2L, 1L), (2L, 0L), (1L, 1L)).toDF("score", "y")
    val got = Eval.rocPoints(tied, "score", "y").collect()
    assert(got.length === 2)
    val at2 = got.find(_.getLong(0) == 2L).get
    assert((at2.getLong(1), at2.getLong(2)) === ((1L, 1L)))
  }

  test("spearman: identical order 1.0, reversed −1.0, n=1 guard 0.0") {
    val same = Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L),
      (4L, 40L, 400L)).toDF("id", "a", "b")
    val s = Eval.spearman(same, "id", "a", "b").collect().head
    assert((s.getLong(1), s.getDouble(2)) === ((0L, 1.0)))
    val rev = Seq((1L, 10L, 400L), (2L, 20L, 300L), (3L, 30L, 200L),
      (4L, 40L, 100L)).toDF("id", "a", "b")
    assert(Eval.spearman(rev, "id", "a", "b").collect().head
      .getDouble(2) === -1.0)
    val one = Seq((1L, 5L, 7L)).toDF("id", "a", "b")
    assert(Eval.spearman(one, "id", "a", "b").collect().head
      .getDouble(2) === 0.0)
  }

  test("spearman: hand-computed mid case with deterministic tie ranks") {
    // a: 1,2,3 (by id on the tie 20,20); b: one swap
    val df = Seq((1L, 20L, 1L), (2L, 20L, 3L), (3L, 30L, 2L))
      .toDF("id", "a", "b")
    // ranks a: id1→1, id2→2, id3→3; ranks b: id1→1, id2→3, id3→2
    // Σd² = 0 + 1 + 1 = 2; ρ = 1 − 6·2/(3·8) = 0.5
    val s = Eval.spearman(df, "id", "a", "b").collect().head
    assert((s.getLong(0), s.getLong(1), s.getDouble(2)) === ((3L, 2L, 0.5)))
  }
}
