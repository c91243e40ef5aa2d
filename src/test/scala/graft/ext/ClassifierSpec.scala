package graft.ext

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "web", "the cat sat on the mat"),
    (2L, "web", "the dog sat on the rug"),
    (3L, "code", "def foo return bar end"),
    (4L, "code", "class foo extends bar end")).toDF("doc_id", "source", "text")

  test("profiles are L1-normalized q6 integer weights per class") {
    val prof = Classifier.classProfiles(docs, "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // web corpus: 12 gram occurrences, 'the' appears 4x → floor(4e6/12)
    assert(prof.contains(("web", "the", 333333L)))
    assert(prof.contains(("web", "sat", 166666L)))
    // code corpus: 10 occurrences, 'foo' 2x → 200000
    assert(prof.contains(("code", "foo", 200000L)))
    // weights within a class sum to ≤ 1e6 (floor division) and > 1e6 - vocab
    val webSum = prof.toSeq.collect { case ("web", _, w) => w }.sum
    assert(webSum <= 1000000L && webSum > 1000000L - 20L)
  }

  test("predict routes held-out docs to the nearest class profile; OOV predicts null") {
    val prof = Classifier.classProfiles(docs, "source")
    val test = Seq(
      (10L, "the cat sat"),            // web vocabulary
      (11L, "def class foo bar"),      // code vocabulary
      (12L, "zzz qqq xxx")             // fully out-of-vocabulary
    ).toDF("doc_id", "text")
    val got = Classifier.predict(test, prof).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got(10L) === Some("web"))
    assert(got(11L) === Some("code"))
    assert(got(12L) === None)
  }

  test("training state is a mergeable monoid: split-fold ≡ one-shot training") {
    import org.apache.spark.sql.functions.col
    val d = docs
    val parts = Seq(
      d.filter(col("doc_id").isin(1L, 4L)),
      d.filter(col("doc_id") === 2L),
      d.filter(col("doc_id") === 3L))
    val folded = parts.map(p => Classifier.trainState(p, "source"))
      .reduce(Classifier.mergeStates)
    val fromState = Classifier.profilesFromState(folded).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val oneShot = Classifier.classProfiles(d, "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(fromState === oneShot)
    // and predictions from the folded state match the one-shot model
    val test = Seq((10L, "the cat sat"), (11L, "def class foo bar"))
      .toDF("doc_id", "text")
    val a = Classifier.predict(test, Classifier.profilesFromState(folded))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = Classifier.predict(test, Classifier.classProfiles(d, "source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("exact score ties break to the lexicographically smallest label") {
    val tied = Seq(
      (1L, "a", "x x y"),
      (2L, "b", "x x y")).toDF("doc_id", "source", "text")
    val prof = Classifier.classProfiles(tied, "source")
    // both classes have identical profiles → every score ties → 'a'
    val got = Classifier.predict(Seq((9L, "x y")).toDF("doc_id", "text"), prof)
      .collect().head
    assert(got.getString(1) === "a")
  }

  test("evaluate F1 is exact on a composite denominator (ADVICE r10: precedence guard)") {
    // a class where tp > 0 and n_actual + n_predicted is small and
    // UNEQUAL — the composite-denominator case where an unparenthesized
    // '% den' / '// den' in the oracle floors wrongly (x % a + b parses
    // as (x % a) + b). Fixture: label 'a' has n_actual=1, n_predicted=2,
    // tp=1 → F1 = floor(2·1·10⁴ / 3)/10⁴ = 0.6666 exactly; the buggy
    // parse would yield ((2·10⁴) % 1) + 2 = 2 → garbage.
    import org.apache.spark.sql.functions.col
    val truth = Seq((1L, "a"), (2L, "b"), (3L, "b"))
      .toDF("doc_id", "label")
    val predicted = Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("doc_id", "predicted")
    val got = Classifier.evaluate(predicted, truth).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // label a: n_actual=1, n_predicted=2, tp=1
    assert(got("a") === ((1L, 2L, 1L, 0.5, 1.0, 0.6666)))
    // label b: n_actual=2, n_predicted=1, tp=1 → P=1, R=0.5, F1=0.6666
    assert(got("b") === ((2L, 1L, 1L, 1.0, 0.5, 0.6666)))
  }

  test("scoring is integer-exact: score equals hand-computed sum of q6 weights") {
    val prof = Classifier.classProfiles(docs, "source")
    val got = Classifier.predict(Seq((20L, "the the dog")).toDF("doc_id", "text"), prof)
      .collect().head
    // web: the=333333 (x2) + dog=83333 = 749999; code: all OOV
    assert(got.getString(1) === "web")
    assert(got.getLong(2) === 749999L)
  }

  test("predictWithMargin: gap to second-best; single-class margin = s1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the dog runs", "web"), (2L, "the dog sat", "web"),
      (3L, "def foo bar", "code"), (4L, "def bar baz", "code"))
      .toDF("doc_id", "text", "source")
    val prof = Classifier.classProfiles(docs, "source")
    val m = Classifier.predictWithMargin(
      Seq((10L, "the def"), (11L, "dog dog"), (12L, "zzz unseen"))
        .toDF("doc_id", "text"), prof)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 10 scores BOTH classes → margin = s1 − s2 with the same
    // winner/tie rule as predict
    val both = m(10L)
    val p = Classifier.predict(
      Seq((10L, "the def")).toDF("doc_id", "text"), prof).collect().head
    assert(both.getString(1) === p.getString(1))
    assert(both.getLong(3) < both.getLong(2))
    // doc 11 only hits 'web' vocabulary → margin = full best score
    assert(m(11L).getString(1) === "web")
    assert(m(11L).getLong(3) === m(11L).getLong(2))
    // doc 12: no overlap → null prediction, null margin
    assert(m(12L).isNullAt(1) && m(12L).isNullAt(3))
  }

  test("predictSelfTrained ≡ the two-call form, one tokenization (r13)") {
    val twoCall = Classifier.predict(docs,
      Classifier.classProfiles(docs, "source"))
      .collect().map(_.toSeq).toSet
    val onePass = Classifier.predictSelfTrained(docs, "source")
      .collect().map(_.toSeq).toSet
    assert(onePass === twoCall)
    val twoCallM = Classifier.predictWithMargin(docs,
      Classifier.classProfiles(docs, "source"))
      .collect().map(_.toSeq).toSet
    val onePassM = Classifier.predictSelfTrained(docs, "source",
      withMargin = true).collect().map(_.toSeq).toSet
    assert(onePassM === twoCallM)
  }
}
