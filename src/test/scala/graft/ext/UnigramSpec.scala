package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM tokenizer: Viterbi semantics, engine/driver parity, the
  * EM-prune trainer on a hand-computable corpus, and code-point safety. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val committed = Unigram.pieces.toMap

  test("Viterbi picks the min-cost segmentation with the longer-piece tie rule") {
    // committed costs: the=9 beats th+e=21 beats t+h+e=37
    assert(Unigram.segmentWord("the", committed) === List("the"))
    // spark: s(13)+p(14)+ar(9)+k(16)=52 beats s+p+a+r+k=68
    assert(Unigram.segmentWord("spark", committed) ===
      List("s", "p", "ar", "k"))
    // unknown single chars fall back to unkCost and always segment
    assert(Unigram.segmentWord("#", committed) === List("#"))
  }

  test("engine tokenize equals the driver DP word by word") {
    val d = Seq((1L, "the quick brown fox"), (2L, "spark engines, 42!"),
      (3L, ""), (4L, "internationalization"))
      .toDF("doc_id", "text")
    val got = Unigram.tokenize(d, Unigram.pieces).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    def expect(t: String): (Long, String) = {
      val words = "[a-z]+|[0-9]|[^a-z0-9\\s]".r
        .findAllIn(t.toLowerCase).toList
      val toks = words.flatMap(w => Unigram.segmentWord(w, committed))
      (toks.size.toLong,
        java.security.MessageDigest.getInstance("MD5")
          .digest(toks.mkString(Bpe.sep).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }
    Seq(1L -> "the quick brown fox", 2L -> "spark engines, 42!",
      3L -> "", 4L -> "internationalization").foreach { case (id, t) =>
      assert(got(id) === expect(t), s"doc $id")
    }
  }

  test("EM-prune trainer: hand-computed two-word corpus") {
    // vocab {abab x10, ab x5}: E1 segments abab as the whole-word piece,
    // prune (budget 1) keeps abab, E2 re-prices — a/b regain their use
    // from the now-unsegmentable 'ab'
    val learned = Unigram.trainFromWordVocab(
      Seq("abab" -> 10L, "ab" -> 5L), budget = 1, seedCap = 64)
    assert(learned === Seq(("a", 2L, 5L), ("abab", 1L, 10L), ("b", 2L, 5L)))
  }

  test("trained vocabulary respects the budget and covers every char") {
    val d = graft.Tables.load(spark, sf(), "documents")
    val learned = Unigram.train(d, budget = 12, seedCap = 64)
    val multi = learned.filter(_._1.length > 1)
    assert(multi.size <= 12)
    assert(learned.forall(_._2 >= 0L))
    // every character of every word is a piece → tokenize total
    val vocabMap = learned.map(x => x._1 -> x._2).toMap
    val chars = d.select(explode(split(lower(col("text")), "")).as("c"))
      .filter(col("c").rlike("[a-z0-9]")).distinct()
      .collect().map(_.getString(0))
    chars.foreach(c => assert(vocabMap.contains(c), s"char '$c' missing"))
    // train → apply round-trips: token counts positive for non-empty docs
    val t = Unigram.tokenize(d, learned.map(x => (x._1, x._2)))
    assert(t.filter(col("n_tokens") <= 0L).count() === 0L)
  }

  test("code points, not UTF-16 units: non-BMP chars tokenize consistently") {
    val d = Seq((1L, "a😀b")).toDF("doc_id", "text") // a😀b
    val got = Unigram.tokenize(d, Unigram.pieces).collect().head
    // pre-tokenizer splits into 'a', '😀', 'b'; the emoji is an UNK char
    assert(got.getLong(1) === 3L)
    val exp = Seq("a", "😀", "b").mkString(Bpe.sep)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(exp.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.getString(2) === md5hex)
    // and the driver DP agrees
    assert(Unigram.segmentWord("😀", committed) ===
      List("😀"))
  }
}
