package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordPiece greedy longest-match: hand cases, the greedy-vs-Viterbi
  * divergence, engine/driver parity, and the BPE→WordPiece vocab
  * conversion. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val vocabSet = Unigram.pieces.map(_._1).toSet

  test("greedy longest match: hand cases and the divergence from min-cost") {
    assert(WordPiece.segmentGreedy("the", vocabSet) === List("the"))
    // greedy grabs 'ati' first; Viterbi prefers at|ion (cost 8+11 beats
    // ati|on 12+8) — same piece count, different boundaries: the exact
    // shape q_tokenizer_greedy_gap counts via digest mismatch
    assert(WordPiece.segmentGreedy("ation", vocabSet) === List("ati", "on"))
    assert(Unigram.segmentWord("ation", Unigram.pieces.toMap) ===
      List("at", "ion"))
    // chars outside the vocabulary pass through as single-char pieces
    assert(WordPiece.segmentGreedy("#", vocabSet) === List("#"))
    assert(WordPiece.segmentGreedy("", vocabSet) === Nil)
  }

  test("engine tokenize equals the driver greedy word by word") {
    val d = Seq((1L, "the quick brown fox"), (2L, "ation stations, 42!"),
      (3L, ""), (4L, "a😀b"))
      .toDF("doc_id", "text")
    val got = WordPiece.tokenize(d, Unigram.pieces).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    def expect(t: String): (Long, String) = {
      val words = "[a-z]+|[0-9]|[^a-z0-9\\s]".r
        .findAllIn(t.toLowerCase).toList
      val toks = words.flatMap(w => WordPiece.segmentGreedy(w, vocabSet))
      (toks.size.toLong,
        java.security.MessageDigest.getInstance("MD5")
          .digest(toks.mkString(Bpe.sep).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }
    Seq(1L -> "the quick brown fox", 2L -> "ation stations, 42!",
      3L -> "", 4L -> "a😀b").foreach { case (id, t) =>
      assert(got(id) === expect(t), s"doc $id")
    }
  }

  test("BPE→WordPiece conversion: chars plus merge outputs, apply round-trips") {
    val d = graft.Tables.load(spark, sf(), "documents")
    val vocab = WordPiece.vocabFromBpe(d, numMerges = 12)
    val merges = Bpe.train(d, 12).map { case (l, r, _) => l + r }
    val vs = vocab.map(_._1).toSet
    merges.foreach(m => assert(vs.contains(m), s"merge output '$m' missing"))
    assert(vocab.forall(_._1.nonEmpty))
    // single chars of every corpus word are present (greedy never stalls)
    assert(vs.exists(_.length == 1))
    val t = WordPiece.tokenize(d, vocab)
    assert(t.filter(col("n_tokens") <= 0L).count() === 0L)
    // engine ≡ driver on a sampled word set under the learned vocabulary
    val words = d.select(explode(Bpe.pieces(col("text"))).as("w"))
      .distinct().limit(50).collect().map(_.getString(0))
    val fromEngine = WordPiece
      .tokenize(words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toSeq.toDF("doc_id", "text"), vocab)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(fromEngine(i.toLong) ===
        WordPiece.segmentGreedy(w, vs).size.toLong, s"word '$w'")
    }
  }

  // --------------------------------------------------- BERT conventions

  private val (bInit, bCont) = WordPiece.bertSplit(WordPiece.bertPieces)

  test("BERT walk: ## marking, initial-only long pieces, whole-word [UNK]") {
    // continuation pieces carry ## in the output
    assert(WordPiece.segmentBert("the", bInit, bCont) === List("the"))
    assert(WordPiece.segmentBert("ation", bInit, bCont) ===
      List("ati", "##on"))
    // 'tion' (len 4 > maxContLen) is INITIAL-ONLY: flat greedy takes it
    // mid-word, BERT must settle for shorter continuations — the exact
    // divergence q_tokenizer_bert_parity counts
    assert(WordPiece.segmentGreedy("option", vocabSet) ===
      List("o", "p", "tion"))
    assert(WordPiece.segmentBert("option", bInit, bCont) ===
      List("o", "##p", "##ti", "##on"))
    // a char absent from the vocabulary fails the WHOLE word (flat keeps
    // it as a lossless single-char fallback)
    assert(WordPiece.segmentGreedy("a#b", vocabSet) === List("a", "#", "b"))
    assert(WordPiece.segmentBert("#", bInit, bCont) ===
      List(WordPiece.unk))
    assert(WordPiece.segmentBert("a#b", bInit, bCont) ===
      List(WordPiece.unk))
    // unmatched only past position 0 — still the whole word
    assert(WordPiece.segmentBert("the#", bInit, bCont) ===
      List(WordPiece.unk))
    assert(WordPiece.segmentBert("", bInit, bCont) === Nil)
  }

  test("BERT engine tokenize equals the driver mirror, with unk counts") {
    val d = Seq((1L, "the quick brown fox"), (2L, "ation stations, 42!"),
      (3L, ""), (4L, "a😀b"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = WordPiece.tokenizeBert(d, WordPiece.bertPieces).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    def expect(t: String): (Long, Long, Option[String]) = {
      val words = "[a-z]+|[0-9]|[^a-z0-9\\s]".r
        .findAllIn(t.toLowerCase).toList
      val toks = words.flatMap(w => WordPiece.segmentBert(w, bInit, bCont))
      (toks.size.toLong, toks.count(_ == WordPiece.unk).toLong,
        Some(java.security.MessageDigest.getInstance("MD5")
          .digest(toks.mkString(Bpe.sep).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString))
    }
    Seq(1L -> "the quick brown fox", 2L -> "ation stations, 42!",
      3L -> "", 4L -> "a😀b").foreach { case (id, t) =>
      assert(got(id) === expect(t), s"doc $id")
    }
    // punctuation / emoji words are [UNK] under BERT (absent chars)
    assert(got(2L)._2 >= 2L) // ',' and '!'
    assert(got(4L)._2 === 1L) // the emoji word
    // null text: 0 tokens, null digest (the shared contract)
    assert(got(5L) === ((0L, 0L, None)))
  }

  test("restricted-vocab OOV: rare-letter words fall to whole-word [UNK]") {
    import org.apache.spark.sql.functions.col
    // the q_tok_oov scenario: a frozen vocab missing q/j/k/x/z pieces
    val restricted = WordPiece.bertPieces
      .filterNot { case (p, _) => p.exists("qjkxz".contains(_)) }
    val docs = Seq((0L, "the data join"), (1L, "query key value"))
      .toDF("doc_id", "text")
    val got = WordPiece.tokenizeBert(docs, restricted)
      .select(col("doc_id"), col("n_tokens"), col("n_unk_words"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 0: "join" -> [UNK]; "the"/"data" segment normally
    assert(got(0L)._2 === 1L)
    // doc 1: "query" and "key" both fail; "value" segments
    assert(got(1L)._2 === 2L)
    // the committed (unrestricted) vocab covers everything: 0 [UNK]
    val full = WordPiece.tokenizeBert(docs, WordPiece.bertPieces)
      .agg(org.apache.spark.sql.functions.sum(col("n_unk_words")))
      .collect()(0).getLong(0)
    assert(full === 0L)
  }
}
