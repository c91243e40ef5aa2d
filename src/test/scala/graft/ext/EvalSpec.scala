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

  test("ngramPrecision: hand-computed clipped counts, short-doc zeros") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat on the mat"),
      (3L, "x")) // one word: no bigrams at all
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 1L)).toDF("id_a", "id_b")
    val r = Eval.ngramPrecision(pairs, docs).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5), x.getLong(6), x.getLong(7)))).toMap
    // a=1,b=2 unigrams: clip = min counts of {the:2, cat:1, sat:0,
    // on:1, mat:1} = 5 of tot 6 → ⌊5e6/6⌋; bigrams: {the cat, on the,
    // the mat} = 3 of tot 5 → 600000
    assert(r((1L, 2L)) === ((5L, 6L, 833333L, 3L, 5L, 600000L)))
    // nothing shared with "x": zero clips, totals still id_a's
    assert(r((1L, 3L)) === ((0L, 6L, 0L, 0L, 5L, 0L)))
    // id_a with no bigrams: tot2 = 0 floors to p = 0, never null/crash
    assert(r((3L, 1L)) === ((0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("ngramPrecision: self-pair scores exactly 1.0 in ppm") {
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 1L)).toDF("id_a", "id_b")
    val r = Eval.ngramPrecision(pairs, docs).collect().head
    assert((r.getLong(4), r.getLong(7)) === ((1000000L, 1000000L)))
  }

  test("fleissKappa: textbook small case, exact integer reduction") {
    val df = Seq(
      (1L, "A", "A", "A"), // unanimity
      (2L, "A", "A", "B"),
      (3L, "B", "B", "B"),
      (4L, "A", "B", "C")) // total disagreement
      .toDF("id", "r1", "r2", "r3")
    val r = Eval.fleissKappa(df, "id", Seq("r1", "r2", "r3"))
      .collect().head
    // S1 = 6+2+6+0 = 14; marginals A=6 B=5 C=1 → S2 = 62
    // κ = (3·4·14 − 2·62) / (2·(144 − 62)) = 44/164
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 3L, 14L, 62L)))
    assert(r.getDouble(4) === 44.0 / 164.0)
  }

  test("fleissKappa: degenerate single-category corpus reports 0") {
    val df = Seq((1L, "A", "A", "A"), (2L, "A", "A", "A"))
      .toDF("id", "r1", "r2", "r3")
    assert(Eval.fleissKappa(df, "id", Seq("r1", "r2", "r3"))
      .collect().head.getDouble(4) === 0.0)
  }

  test("selfOverlap: bucket pairs, floor means, singletons drop out") {
    val docs = Seq(
      (1L, "a b", "s0"), (2L, "a b", "s0"), // identical pair
      (3L, "x y", "s1"), (4L, "y z", "s1"), // one shared word, no bigram
      (5L, "solo", "s2")) // a 1-doc stratum yields no pair
      .toDF("doc_id", "text", "source")
    val r = Eval.selfOverlap(docs, buckets = 1).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("s0") === ((1L, 1000000L, 1000000L)))
    assert(r("s1") === ((1L, 500000L, 0L)))
    assert(!r.contains("s2"))
  }

  test("rougeL: LCS sees order that bag overlap cannot") {
    val docs = Seq(
      (1L, "One. Two. Three. Four."),
      (2L, "Two. Three. Five. Four."), // drop One, insert Five
      (3L, "Four. Three. Two. One."), // same sentences REVERSED
      (4L, "")) // no sentences at all
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 1L))
      .toDF("id_a", "id_b")
    val r = Eval.rougeL(pairs, docs).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
          x.getLong(6), x.getLong(7)))).toMap
    // sentences of 1: One,Two,Three,"Four." — LCS with 2 is
    // Two,Three,"Four." = 3 of 4 both sides
    assert(r((1L, 2L)) === ((4L, 4L, 3L, 750000L, 750000L, 750000L)))
    // reversal: Two+Three shared (One./Four. differ — the terminator
    // run only strips mid-text) but reversed order collapses LCS to 1
    assert(r((1L, 3L)) === ((4L, 4L, 1L, 250000L, 250000L, 250000L)))
    assert(r((1L, 4L)) === ((4L, 0L, 0L, 0L, 0L, 0L)))
    assert(r((1L, 1L)) ===
      ((4L, 4L, 4L, 1000000L, 1000000L, 1000000L)))
  }
}
