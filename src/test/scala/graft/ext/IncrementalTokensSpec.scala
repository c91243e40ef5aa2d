package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.store.TableStore

class IncrementalTokensSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft-inctok").toString)

  private def asMap(df: DataFrame) = df.collect()
    .map(r => r.getLong(0) -> ((r.getLong(1),
      if (r.isNullAt(2)) null else r.getString(2)))).toMap

  private val corpus = Seq(
    (1L, "the theater is near"), (2L, "near the gate"),
    (3L, "gates and theaters"), (4L, ""), (5L, null.asInstanceOf[String]),
    (6L, "entirely fresh wording here"))

  test("equivalence: union of increments equals the batch tokenize") {
    val store = freshStore()
    val docs = corpus.toDF("doc_id", "text")
    val inc1 = IncrementalTokens.tokenizeIncrement(
      docs.filter($"doc_id" <= 3L), store, "m")
    val inc2 = IncrementalTokens.tokenizeIncrement(
      docs.filter($"doc_id" > 3L), store, "m")
    val got = asMap(inc1.unionByName(inc2))
    val want = asMap(Unigram.tokenize(docs, Unigram.pieces))
    assert(got === want)
    assert(got(4L)._1 === 0L && got(4L)._2 != null) // empty text: md5("")
    assert(got(5L) === ((0L, null)))                 // null text: null digest
  }

  test("memoization: only NEW word types segment; replay appends nothing") {
    val store = freshStore()
    val inc1docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val out1 = asMap(IncrementalTokens.tokenizeIncrement(inc1docs, store, "m"))
    assert(IncrementalTokens.memoSize(store, "m") === 3L)
    // overlap: 2 memo hits + 1 new type → memo grows by exactly 1
    val inc2docs = Seq((2L, "beta gamma delta")).toDF("doc_id", "text")
    IncrementalTokens.tokenizeIncrement(inc2docs, store, "m")
    assert(IncrementalTokens.memoSize(store, "m") === 4L)
    // replay of increment 1: identical output, zero memo growth
    val replay = asMap(IncrementalTokens.tokenizeIncrement(inc1docs, store, "m"))
    assert(replay === out1)
    assert(IncrementalTokens.memoSize(store, "m") === 4L)
  }

  test("greedy (WordPiece) face: increments equal the batch tokenize, memos don't mix") {
    val store = freshStore()
    val docs = corpus.toDF("doc_id", "text")
    // a vocabulary where greedy and Viterbi differ ("ati|on" vs "at|ion")
    // would prove segmenter separation best, but the committed pieces
    // already diverge on real words — assert against the WordPiece twin
    val inc1 = IncrementalTokens.tokenizeIncrementGreedy(
      docs.filter($"doc_id" <= 3L), store, "wp", Unigram.pieces)
    val inc2 = IncrementalTokens.tokenizeIncrementGreedy(
      docs.filter($"doc_id" > 3L), store, "wp", Unigram.pieces)
    val got = asMap(inc1.unionByName(inc2))
    assert(got === asMap(WordPiece.tokenize(docs, Unigram.pieces)))
  }

  test("degenerate increments: empty frame, null-only text, then real docs") {
    val store = freshStore()
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(IncrementalTokens.tokenizeIncrement(empty, store, "m").count() === 0)
    assert(IncrementalTokens.memoSize(store, "m") === 0L)
    // null-only increment: rows come back (null digest), memo stays empty
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = asMap(IncrementalTokens.tokenizeIncrement(nulls, store, "m"))
    assert(out(1L) === ((0L, null)))
    assert(IncrementalTokens.memoSize(store, "m") === 0L)
    // a real increment afterwards behaves exactly like a first one
    val real = asMap(IncrementalTokens.tokenizeIncrement(
      Seq((2L, "alpha beta")).toDF("doc_id", "text"), store, "m"))
    assert(real(2L)._1 > 0L)
    assert(IncrementalTokens.memoSize(store, "m") === 2L)
  }

  test("memoized and fresh segmentations are bit-identical across runs") {
    // the SAME word tokenized via the memo (run 2) and via the DP
    // (fresh store) must produce one digest — the pure-function law
    val store = freshStore()
    val doc = Seq((1L, "theatrical")).toDF("doc_id", "text")
    val viaDp = asMap(IncrementalTokens.tokenizeIncrement(doc, store, "m"))
    val viaMemo = asMap(IncrementalTokens.tokenizeIncrement(
      Seq((2L, "theatrical")).toDF("doc_id", "text"), store, "m"))
    assert(viaDp(1L) === viaMemo(2L))
  }
}
