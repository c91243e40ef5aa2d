package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val eval = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")

  test("overlap stats count shared n-grams and stay on the 4-decimal grid") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),      // full overlap: both 3-grams shared
      (2L, "alpha beta gamma zz ww vv"),   // 1 of 4 grams shared
      (3L, "xx yy zz ww"),                 // no overlap
      (4L, "hi")                           // < 3 words: no grams at all
    ).toDF("doc_id", "text")
    val r = Decontamination.overlapStats(docs, eval, n = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4))).toMap
    assert(r(1L) === ((2L, 2L, 1.0, 1L)))
    assert(r(2L) === ((4L, 1L, 0.25, 1L)))
    assert(r(3L) === ((2L, 0L, 0.0, 0L)))
    assert(r(4L) === ((0L, 0L, 0.0, 0L)))
  }

  test("span excision cuts only covered words; overlapping grams drop the union") {
    val docs = Seq(
      (1L, "xx alpha beta gamma yy"),          // one hit at i=1 → words 1..3 cut
      (2L, "alpha beta gamma delta zz"),       // hits at i=0,1 (overlap) → words 0..3 cut
      (3L, "xx yy zz ww"),                     // clean → untouched
      (4L, "hi")                               // < n words → no grams, untouched
    ).toDF("doc_id", "text")
    val r = Decontamination
      .exciseOverlaps(docs, Decontamination.evalGrams(eval), n = 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === (("xx yy", 1L, 3L)))
    assert(r(2L) === (("zz", 2L, 4L)))
    assert(r(3L) === (("xx yy zz ww", 0L, 0L)))
    assert(r(4L) === (("hi", 0L, 0L)))
  }

  test("n-sweep profile: contamination decays with n; counts hand-check") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),  // shares 2..4-grams with eval
      (2L, "alpha beta xx yy"),        // shares only the 2-gram "alpha beta"
      (3L, "ww xx yy zz")              // clean at every n
    ).toDF("doc_id", "text")
    val r = Decontamination.overlapProfile(docs, eval, ns = Seq(2, 3, 4))
      .collect().map(x => x.getInt(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // n=2: doc1 has 3 grams all shared, doc2 has 3 grams 1 shared, doc3 3/0
    assert(r(2) === ((3L, 2L, 9L, 4L)))
    // n=3: doc1 2/2 shared, doc2 2/0, doc3 2/0
    assert(r(3) === ((3L, 1L, 6L, 2L)))
    // n=4: doc1 1/1 shared, others 1/0
    assert(r(4) === ((3L, 1L, 3L, 1L)))
    // doc contamination is non-increasing in n on a nested eval set
    val fr = Decontamination.overlapProfile(docs, eval, ns = Seq(2, 3, 4))
      .collect().map(x => x.getInt(0) -> x.getDouble(5)).toMap
    assert(fr(2) >= fr(3) && fr(3) >= fr(4))
  }

  test("clean gate drops any-overlap docs at maxFrac=0 and keeps them at 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (3L, "xx yy zz ww"),
      (4L, "hi")
    ).toDF("doc_id", "text")
    val strict = Decontamination.clean(docs, eval).select("doc_id")
      .as[Long].collect().sorted
    assert(strict.sameElements(Array(3L, 4L)))
    val lax = Decontamination.clean(docs, eval, maxFrac = 1.0).select("doc_id")
      .as[Long].collect().sorted
    assert(lax.sameElements(Array(1L, 3L, 4L)))
  }

  test("strict gate rejects one shared gram even among >10^4 grams (no floor leak)") {
    // contaminated_frac floors to 0.0000 here; the gate must still reject
    val words = (0 until 10205).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, s"alpha beta gamma $words")).toDF("doc_id", "text")
    val stats = Decontamination.overlapStats(docs, eval, n = 3).collect()(0)
    assert(stats.getLong(2) === 1L)       // one shared gram ("alpha beta gamma")
    assert(stats.getDouble(3) === 0.0)    // display fraction floors to zero...
    assert(Decontamination.clean(docs, eval).count() === 0) // ...but the gate rejects
  }

  test("eval-set grams are deduplicated — repeats in eval don't double-count") {
    val dupEval = Seq((100L, "alpha beta gamma"), (101L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val r = Decontamination.overlapStats(docs, dupEval, n = 3).collect()
    assert(r.head.getLong(2) === 1L) // one shared gram, counted once
  }

  test("semantic overlap flags embedding proximity lexical grams can't see") {
    // eval vector e1 = (1,0,0,0); train 1 = same direction scaled (a
    // "paraphrase": cos 1), train 2 = near-orthogonal, train 3 closest to
    // eval e2 — checks flag, argmax target, and threshold behavior
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val evalE = Seq((100L, v(1, 0, 0, 0)), (101L, v(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (1L, v(2, 0, 0, 0)),          // cos 1.0 with e100
      (2L, v(0.01, 0, 0, 1)),       // ~0.01 with e100, 0 with e101
      (3L, v(0.1, 0.9, 0, 0)))      // closest to e101
      .toDF("vec_id", "embedding")
    val r = Decontamination.semanticOverlap(train, evalE, threshold = 0.4)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getLong(3))).toMap
    assert(r(1L)._1 === 100L && r(1L)._2 === 1.0 && r(1L)._3 === 1L)
    assert(r(2L)._3 === 0L, s"orthogonal vector must stay clean: $r")
    assert(r(3L)._1 === 101L && r(3L)._3 === 1L, s"argmax must pick e101: $r")
  }

  test("literal-baked semantic gate equals the batch operator on real embeddings") {
    val e = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val train = e.filter($"vec_id" % 97 =!= 0)
    val evalE = e.filter($"vec_id" % 97 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val batch = rows(Decontamination.semanticOverlap(train, evalE, 0.4))
    val literal = rows(Decontamination.semanticOverlapLiteral(train, evalE, 0.4))
    assert(literal === batch)
    assert(batch.nonEmpty)
  }

  test("indexed semantic gate: flags are a subset of exact, all train ids present, exact cosines") {
    val e = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val train = e.filter($"vec_id" % 97 =!= 0)
    val evalE = e.filter($"vec_id" % 97 === 0)
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-dcx").toString)
    val exact = Decontamination.semanticOverlap(train, evalE, 0.4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
          r.getLong(3))).toMap
    val idx = Decontamination.semanticOverlapIndexed(store, train, evalE)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
          r.getLong(3))).toMap
    // every train id reports exactly once on both faces
    assert(idx.keySet === exact.keySet)
    // the indexed flag set is a SUBSET of the exact one (the routing
    // re-scores exact cosines over a candidate subset — it can miss,
    // never over-flag), and a retrieved max_cos never exceeds the exact
    // max (it is the same rounded cosine over fewer eval candidates)
    idx.foreach { case (id, (cos, flag)) =>
      if (flag == 1L) assert(exact(id)._2 === 1L,
        s"indexed flagged $id which exact did not")
      if (!cos.isNaN && !exact(id)._1.isNaN)
        assert(cos <= exact(id)._1 + 1e-9,
          s"indexed max_cos for $id exceeds the exact max")
    }
    assert(exact.values.count(_._2 == 1L) >= 1, "fixture has contamination")
  }

  test("incremental decontamination: increments compose to the full recompute") {
    val d = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val eval = d.filter($"doc_id" % 97 === 0)
    val train = d.filter($"doc_id" % 97 =!= 0)
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-decontam").toString)
    Decontamination.indexEval(store, "dc", eval)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    // two disjoint increments, then a full-replay increment (no-op)
    val inc1 = Decontamination.decontaminateIncrement(store, "dc",
      train.filter($"doc_id" < 200))
    assert(rows(inc1).nonEmpty)
    Decontamination.decontaminateIncrement(store, "dc",
      train.filter($"doc_id" >= 200))
    val replay = Decontamination.decontaminateIncrement(store, "dc", train)
    assert(replay.count() === 0L, "replayed increment must be a no-op")
    // the standing state IS the one-shot recompute
    val state = rows(Decontamination.decontaminationState(store, "dc"))
    val full = rows(Decontamination.overlapStats(train, eval))
    assert(state === full)
    store.destroy()
  }

  test("empty eval set: both semantic faces return every row clean (ADVICE r9)") {
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val train = Seq((1L, v(1, 0)), (2L, v(0, 1))).toDF("vec_id", "embedding")
    val evalE = train.filter($"vec_id" < 0) // empty, same schema
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2), r.getLong(3))).toSet
    val batch = rows(Decontamination.semanticOverlap(train, evalE, 0.4))
    val literal = rows(Decontamination.semanticOverlapLiteral(train, evalE, 0.4))
    val expect = Set((1L, true, true, 0L), (2L, true, true, 0L))
    assert(batch === expect, s"batch face dropped/flagged rows: $batch")
    assert(literal === expect)
  }

  test("semantic overlap argmax tie picks the smallest eval id") {
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // two eval vectors IDENTICAL in direction: cos ties exactly
    val evalE = Seq((200L, v(1, 0)), (100L, v(2, 0))).toDF("vec_id", "embedding")
    val train = Seq((1L, v(3, 0))).toDF("vec_id", "embedding")
    val r = Decontamination.semanticOverlap(train, evalE).collect()(0)
    assert(r.getLong(1) === 100L, s"tie must resolve to the smaller id: $r")
  }

  test("contaminationMatrix rolls any-overlap flags up per (eval_set, stratum)") {
    import org.apache.spark.sql.functions.{col, lit}
    val train = Seq(
      (1L, "web", "alpha beta gamma delta extra"),   // overlaps set A
      (2L, "web", "nothing shared here at all"),
      (3L, "code", "foo bar baz qux quux filler"),   // overlaps set B
      (4L, "code", "alpha beta gamma words more"),   // overlaps set A
      (5L, "code", "clean content only right here"))
      .toDF("doc_id", "source", "text")
    val setA = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val setB = Seq((200L, "foo bar baz qux")).toDF("doc_id", "text")
    val got = Decontamination.contaminationMatrix(train, col("source"),
        Seq("A" -> setA, "B" -> setB)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.size === 4) // 2 sets × 2 strata, zero rows included
    assert(got(("A", "web")) === ((2L, 1L, 0.5)))
    assert(got(("A", "code")) === ((3L, 1L, 0.3333)))
    assert(got(("B", "web")) === ((2L, 0L, 0.0)))
    assert(got(("B", "code")) === ((3L, 1L, 0.3333)))
  }
}
