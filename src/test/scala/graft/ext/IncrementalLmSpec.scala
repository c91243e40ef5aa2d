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
