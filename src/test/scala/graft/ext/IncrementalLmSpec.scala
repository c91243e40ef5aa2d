package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.store.TableStore

class IncrementalLmSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft-inclm").toString)

  private def asMap(df: DataFrame) = df.collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private val corpus = Seq(
    (1L, "a b a b a c"), (2L, "a b x"), (3L, "z"),
    (4L, null.asInstanceOf[String]),
    (5L, "a c a b"), (6L, "x a b"), (7L, "fresh words only here"))

  test("prefix law: each increment scores as the batch KN over its prefix") {
    val store = freshStore()
    val docs = corpus.toDF("doc_id", "text")
    val pre = docs.filter($"doc_id" <= 4L)
    val inc1 = IncrementalLm.scoreIncrement(pre, store, "kn")
    val inc2 = IncrementalLm.scoreIncrement(
      docs.filter($"doc_id" > 4L), store, "kn")
    // increment 1 ≡ batch over the prefix alone
    assert(asMap(inc1) === asMap(TextAnalysis.lmScoreKn(pre)))
    // increment 2 ≡ batch over the WHOLE corpus, restricted to its docs
    val whole = asMap(TextAnalysis.lmScoreKn(docs))
    assert(asMap(inc2) === whole.view.filterKeys(_ > 4L).toMap)
    // the prequential model SHARPENED between increments: doc 5's "a b"
    // bigram scores against richer counts than doc 2 saw — the state is
    // genuinely accumulated, not per-batch
    val state = IncrementalLm.modelState(store, "kn").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchCounts = docs
      .select(org.apache.spark.sql.functions.explode(
        Hashing.ngrams(Hashing.words($"text"), 2)).as("bg"))
      .groupBy($"bg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state === batchCounts) // state law: counts equal batch
  }

  test("trigram face obeys the same prefix law on the same slicing") {
    val store = freshStore()
    val docs = corpus.toDF("doc_id", "text")
    val pre = docs.filter($"doc_id" <= 4L)
    val inc1 = IncrementalLm.scoreIncrement3(pre, store, "kn3")
    val inc2 = IncrementalLm.scoreIncrement3(
      docs.filter($"doc_id" > 4L), store, "kn3")
    assert(asMap(inc1) === asMap(TextAnalysis.lmScoreKn3(pre)))
    val whole = asMap(TextAnalysis.lmScoreKn3(docs))
    assert(asMap(inc2) === whole.view.filterKeys(_ > 4L).toMap)
  }

  test("prefix law holds under arbitrary slicings (three-way, skewed, singleton)") {
    val docs = corpus.toDF("doc_id", "text")
    val all = corpus.map(_._1)
    for (cuts <- Seq(Seq(2L, 4L), Seq(1L), Seq(6L), Seq(1L, 2L, 6L))) {
      val store = freshStore()
      val bounds = (Seq(Long.MinValue) ++ cuts ++ Seq(Long.MaxValue))
      bounds.sliding(2).foreach { case Seq(lo, hi) =>
        val ids = all.filter(i => i > lo && i <= hi)
        if (ids.nonEmpty) {
          val inc = IncrementalLm.scoreIncrement(
            docs.filter($"doc_id".isin(ids: _*)), store, "kn")
          // batch over the prefix ingested so far, restricted to this slice
          val prefix = all.filter(_ <= hi)
          val want = asMap(TextAnalysis.lmScoreKn(
            docs.filter($"doc_id".isin(prefix: _*))))
          assert(asMap(inc) === want.view.filterKeys(ids.contains).toMap,
            s"slicing $cuts failed at ($lo, $hi]")
        }
      }
    }
  }

  test("replayed increment scores nothing and leaves the state unchanged") {
    val store = freshStore()
    val docs = corpus.toDF("doc_id", "text")
    val pre = docs.filter($"doc_id" <= 4L)
    IncrementalLm.scoreIncrement(pre, store, "kn")
    val before = IncrementalLm.modelState(store, "kn").collect().toSet
    val replay = IncrementalLm.scoreIncrement(pre, store, "kn")
    assert(replay.count() === 0L)
    assert(IncrementalLm.modelState(store, "kn").collect().toSet === before)
  }

  test("degenerate increments: empty, bigram-less, then a scoring increment") {
    val store = freshStore()
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(IncrementalLm.scoreIncrement(empty, store, "kn").count() === 0)
    // single-word / null docs: rows emit with (0, 0), no counts accrue
    val degenerate = Seq((1L, "z"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = asMap(IncrementalLm.scoreIncrement(degenerate, store, "kn"))
    assert(out === Map(1L -> ((0L, 0L)), 2L -> ((0L, 0L))))
    assert(IncrementalLm.modelState(store, "kn").count() === 0L)
    // the next increment trains the first usable model and scores by it
    val real = Seq((3L, "a b a b")).toDF("doc_id", "text")
    assert(asMap(IncrementalLm.scoreIncrement(real, store, "kn")) ===
      asMap(TextAnalysis.lmScoreKn(real)))
  }

  test("compactModel on an empty/absent store is a harmless no-op") {
    val store = freshStore()
    IncrementalLm.compactModel(store, "kn") // no state yet: no crash
    assert(IncrementalLm.modelState(store, "kn").count() === 0L)
    // and scoring still bootstraps normally afterwards
    val real = Seq((1L, "a b a b")).toDF("doc_id", "text")
    assert(asMap(IncrementalLm.scoreIncrement(real, store, "kn")) ===
      asMap(TextAnalysis.lmScoreKn(real)))
  }

  test("compactModel folds the per-increment slices; scoring is unchanged") {
    val store = freshStore()
    val docs = corpus.toDF("doc_id", "text")
    IncrementalLm.scoreIncrement(docs.filter($"doc_id" <= 2L), store, "kn")
    IncrementalLm.scoreIncrement(docs.filter($"doc_id".isin(3L, 5L)), store, "kn")
    val before = IncrementalLm.modelState(store, "kn").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // the raw table carries per-increment slices (more rows than grams)
    assert(store.read("kn_bg").count() > before.size)
    IncrementalLm.compactModel(store, "kn")
    assert(store.read("kn_bg").count() === before.size)
    assert(IncrementalLm.modelState(store, "kn").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet === before)
    // the next increment scores exactly as if no compaction happened
    val inc = IncrementalLm.scoreIncrement(
      docs.filter($"doc_id".isin(6L, 7L)), store, "kn")
    val want = asMap(TextAnalysis.lmScoreKn(
      docs.filter($"doc_id".isin(1L, 2L, 3L, 5L, 6L, 7L))))
    assert(asMap(inc) === want.view.filterKeys(k => k == 6L || k == 7L).toMap)
  }

  test("crash before state commit (emit throws): retry re-scores identically") {
    // ADVICE r15: the output emit runs BEFORE any state mutates, so a
    // crash during the output append leaves the state untouched and the
    // at-least-once retry recomputes bit-identical rows — scores are
    // never lost
    val store = freshStore()
    val docs = corpus.toDF("doc_id", "text")
    val pre = docs.filter($"doc_id" <= 4L)
    intercept[RuntimeException] {
      IncrementalLm.scoreIncrement(pre, store, "kn",
        emit = _ => throw new RuntimeException("sink died mid-append"))
    }
    // nothing committed: no ledger, no counts
    assert(IncrementalLm.modelState(store, "kn").count() === 0L)
    assert(!store.exists("kn_docs") || store.read("kn_docs").count() === 0L)
    // the retry scores the full batch, identical to a clean first run
    var emitted: Option[DataFrame] = None
    val out = IncrementalLm.scoreIncrement(pre, store, "kn",
      emit = o => emitted = Some(o))
    assert(asMap(out) === asMap(TextAnalysis.lmScoreKn(pre)))
    assert(asMap(emitted.get) === asMap(out))
  }

  test("crash between ledger and counts: under-counts, never inflates") {
    // ledger-first commit order (ADVICE r15): counts dying after the
    // ledger landed means the retry skips the increment (scores already
    // emitted) and the model under-counts it — the old counts-first
    // order re-counted the increment on retry, permanently inflating
    val failing = new TableStore(spark,
        Files.createTempDirectory("graft-inclm-crash").toString) {
      private var armed = true
      override def appendStaged(name: String, df: DataFrame): Unit = {
        if (name == "kn_bg" && armed) {
          armed = false
          throw new RuntimeException("crash before counts commit")
        }
        super.appendStaged(name, df)
      }
    }
    val docs = corpus.toDF("doc_id", "text")
    val pre = docs.filter($"doc_id" <= 4L)
    var firstEmit: Option[Map[Long, (Long, Long)]] = None
    intercept[RuntimeException] {
      IncrementalLm.scoreIncrement(pre, failing, "kn",
        emit = o => firstEmit = Some(asMap(o)))
    }
    // the scores WERE emitted before the crash — nothing lost
    assert(firstEmit.get === asMap(TextAnalysis.lmScoreKn(pre)))
    // ledger landed, counts did not
    assert(failing.read("kn_docs").count() === 4L)
    assert(IncrementalLm.modelState(failing, "kn").count() === 0L)
    // retry: every doc is ledgered → scores nothing, counts nothing —
    // the model can only UNDER-count, never double-count
    assert(IncrementalLm.scoreIncrement(pre, failing, "kn").count() === 0L)
    assert(IncrementalLm.modelState(failing, "kn").count() === 0L)
    // later increments still work against the (under-counted) state
    val later = IncrementalLm.scoreIncrement(
      docs.filter($"doc_id" === 7L), failing, "kn")
    assert(asMap(later) === asMap(
      TextAnalysis.lmScoreKn(docs.filter($"doc_id" === 7L))))
  }

  test("partial replay: only genuinely new docs score and count") {
    val store = freshStore()
    val docs = corpus.toDF("doc_id", "text")
    IncrementalLm.scoreIncrement(docs.filter($"doc_id" <= 2L), store, "kn")
    // docs 1-2 re-delivered alongside new docs 5-6
    val mixed = IncrementalLm.scoreIncrement(
      docs.filter($"doc_id".isin(1L, 2L, 5L, 6L)), store, "kn")
    assert(mixed.select("doc_id").collect().map(_.getLong(0)).sorted
      === Seq(5L, 6L))
    // their scores equal the batch over {1,2,5,6} (the ingested prefix)
    val want = asMap(TextAnalysis.lmScoreKn(
      docs.filter($"doc_id".isin(1L, 2L, 5L, 6L))))
    assert(asMap(mixed) === want.view.filterKeys(k => k == 5L || k == 6L).toMap)
  }
}
