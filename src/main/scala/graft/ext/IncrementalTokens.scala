package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.store.TableStore

/** Memoized incremental tokenization (VERDICT r14 #3) — the cross-RUN
  * form of [[Unigram.tokenize]]: a persisted distinct-word → tokens
  * relation makes re-tokenizing a GROWING corpus O(new word types), not
  * O(all types). The batch tokenizers already amortize within one run
  * (the Viterbi DP runs per distinct word, occurrences rejoin by word);
  * this operator amortizes ACROSS runs — exactly what a production
  * tokenizer service does when its memo cache survives requests, and
  * the shape that turns the tokenizer family's linear-in-types sf1 cost
  * into linear-in-NEW-types per increment.
  *
  * State (one table in a [[TableStore]]): `<name>_wordtoks` (w, toks) —
  * the segmentation of every word type ever seen, under ONE fixed
  * vocabulary. The vocabulary is part of the store's identity (like a
  * shipped .model file): changing pieces/costs requires a new `name`,
  * because memoized rows are pure functions of (w, vocab) and rows from
  * two vocabularies must never mix.
  *
  * Increment mechanics (the [[IncrementalDedup]] discipline):
  *  - one corpus pass extracts (id, pos, w) occurrences;
  *  - the increment's DISTINCT words probe the standing memo with a
  *    broadcast semi-join — the corpus-vocabulary-sized memo table
  *    STREAMS map-side and never shuffles;
  *  - only words absent from the memo run the Viterbi DP (the same
  *    [[Unigram.segmentFrame]] plan as the batch path, so memoized and
  *    fresh segmentations are bit-identical by construction);
  *  - per-doc reassembly joins occurrences against (memo hits ∪ fresh),
  *    both increment-scale;
  *  - the fresh rows append to the memo, AFTER the output is pinned.
  *
  * Laws (asserted in IncrementalTokensSpec):
  *  - EQUIVALENCE: the union of the increments' outputs over any
  *    slicing of a corpus equals the batch [[Unigram.tokenize]] of the
  *    whole corpus — memo rows are pure functions of the word, so WHEN
  *    a word was first seen cannot change any document's tokens.
  *  - IDEMPOTENCE: replaying an increment appends nothing (its words
  *    are all memo hits) and emits the identical output — word-keyed
  *    first-write-wins, the doc-keyed analogue of the dedup index.
  */
object IncrementalTokens {

  private def wordtoksName(name: String) = s"${name}_wordtoks"

  private val memoSchema = StructType(Seq(
    StructField("w", StringType),
    StructField("toks", ArrayType(StringType, containsNull = false))))

  /** Tokenize one increment against the standing memo under the
    * unigram Viterbi segmenter: returns the increment's (id, n_tokens,
    * tok_digest) under the [[Bpe]] output contract, then appends the
    * NEW word types' segmentations to the memo. Per-increment cost: one
    * pass over the increment + a DP over its unseen word types + one
    * pruned one-column probe of the memo. */
  def tokenizeIncrement(newDocs: DataFrame, store: TableStore, name: String,
      vocab: Seq[(String, Long)] = Unigram.pieces,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenizeIncrementWith(newDocs, store, name, vocab,
      Unigram.segmentFrame, Unigram.maxPieceLen, idCol, textCol)

  /** The WordPiece (greedy longest-match) face over the same memo
    * mechanics — one store per (segmenter, vocabulary): memo rows are
    * pure functions of BOTH, so mixing segmenters under one `name`
    * would serve one tokenizer the other's segmentations. */
  def tokenizeIncrementGreedy(newDocs: DataFrame, store: TableStore,
      name: String, vocab: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenizeIncrementWith(newDocs, store, name, vocab,
      WordPiece.segmentFrame, WordPiece.maxLen, idCol, textCol)

  /** The shared memo mechanics around a pluggable per-distinct-word
    * segmenter — the incremental twin of [[Unigram.tokenizeWith]]. */
  private[ext] def tokenizeIncrementWith(newDocs: DataFrame,
      store: TableStore, name: String, vocab: Seq[(String, Long)],
      segment: DataFrame => DataFrame, maxLen: Int,
      idCol: String, textCol: String): DataFrame = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val occ = Unigram.occurrences(newDocs, idCol, textCol)
    // checkpointed: probes the memo AND derives the fresh-word set
    val incWords = occ.select(col("w")).distinct().localCheckpoint(true)
    val memo = store.readOrEmpty(wordtoksName(name), memoSchema)
    // memo hits: increment words broadcast, the standing memo streams
    // map-side — shuffling the memo every increment would make the
    // increment cost O(corpus vocabulary) and defeat the design
    val hits = memo.join(broadcast(incWords), Seq("w"), "left_semi")
      .localCheckpoint(true) // feeds the rejoin AND the fresh-word anti
    val freshWords = incWords
      .join(broadcast(hits.select(col("w"))), Seq("w"), "left_anti")
    val vdf = vocab.toDF("piece", "pcost")
    // the identical segmentation plan as the batch path, over NEW types
    // only; checkpointed: feeds the rejoin AND the memo append
    val fresh = segment(Unigram.candFrame(freshWords, vdf, maxLen))
      .localCheckpoint(true)
    val out = Unigram
      .contract(newDocs, occ, hits.unionByName(fresh), idCol, textCol)
      .localCheckpoint(true) // pin results BEFORE the memo mutates below
    // staged append (ADVICE r15 sweep): each memo row is a complete
    // (w, toks) fact, so a torn move leaves whole words only and the
    // retry's anti-join re-derives exactly the missing types — replay
    // cannot duplicate a word or lose the increment's output (the
    // output is recomputed identically from memo ∪ fresh either way)
    store.appendStaged(wordtoksName(name), fresh)
    out
  }

  /** Word types currently memoized — the state-size readout a capacity
    * plan watches (memo growth is the corpus' type curve, ~O(n^0.5±)
    * by Heaps' law, the whole reason memoization wins). */
  def memoSize(store: TableStore, name: String): Long = {
    val t = wordtoksName(name)
    if (store.exists(t)) store.read(t).count() else 0L
  }
}
