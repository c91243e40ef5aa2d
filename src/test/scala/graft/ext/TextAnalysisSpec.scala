package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).collect()(0).get(0)

  test("whitespace and bpe token counts") {
    assert(one("the quick  brown fox", TextAnalysis.wsTokenCount(col("text"))) === 4L)
    assert(one("  ", TextAnalysis.wsTokenCount(col("text"))) === 0L)
    // "don't stop 42!" → [don]['][t][stop][4][2][!] = 7
    assert(one("don't stop 42!", TextAnalysis.bpeTokenCount(col("text"))) === 7L)
  }

  test("language id picks the dominant stopword language") {
    assert(one("the cat is in the house and it is big",
      TextAnalysis.langId(col("text"))) === "en")
    assert(one("el gato es de la casa y es un gato",
      TextAnalysis.langId(col("text"))) === "es")
    assert(one("xyzzy plugh qwerty",
      TextAnalysis.langId(col("text"))) === "und")
  }

  test("quality score stays in [0,1] and rewards clean prose") {
    val clean = "the quick brown fox jumps over the lazy dog and it is a fine day to run in the sun"
    val junk = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( ))))"
    val qc = one(clean, TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    val qj = one(junk, TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(qc > qj)
    Seq(qc, qj).foreach(q => assert(q >= 0.0 && q <= 1.0))
  }

  test("quality score survives multi-MB documents (no int64 wrap)") {
    // len·tokens ≈ 2.9·10¹⁴ ⇒ the old int64 num·10⁴ (~5·10³·l·t·10⁴)
    // wrapped negative here; the decimal(38,0) path must stay in [0,1]
    val huge = "ab " * 8_000_000 // 24 MB, 8M tokens
    val q = one(huge, TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(q >= 0.0 && q <= 1.0, s"quality=$q")
  }

  test("repetition stats: duplicate mass, mean word length, top bigram") {
    val docs = Seq(
      (1L, "spam spam spam spam"), // all dup; top bigram 'spam spam' x3
      (2L, "one two three four"),  // no repetition
      (3L, "x")                    // 1 word: no bigrams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getDouble(2) === 0.75)          // 3 of 4 words are dups
    assert(r(1L).getString(5) === "spam spam")
    assert(r(1L).getLong(6) === 3L)
    assert(r(1L).getDouble(7) === 1.0)           // every bigram is the top one
    assert(r(2L).getDouble(2) === 0.0)
    assert(r(2L).getDouble(3) === 3.75)          // (3+3+5+4)/4 chars
    assert(r(2L).getDouble(7) === 0.3333)        // 1/3 floored to the grid
    assert(r(3L).getLong(4) === 0L && r(3L).isNullAt(5))
    assert(r(3L).getDouble(7) === 0.0)
  }

  test("fingerprint: equal texts agree, short texts hash whole") {
    val a = one("abcdefghij", TextAnalysis.fingerprint(col("text")))
    val b = one("abcdefghij", TextAnalysis.fingerprint(col("text")))
    assert(a === b)
    assert(one("abc", TextAnalysis.fingerprint(col("text"))) ===
      one("abc", Hashing.hexInt(col("text"))))
    assert(one("abcdefgh", TextAnalysis.distinctGramCount(col("text"))) === 4L)
    assert(one("ab", TextAnalysis.distinctGramCount(col("text"))) === 1L)
  }

  test("hashing vectors: fixed dim, zero for empty, copies identical, order-insensitive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark table scan merge"), (2L, "spark table scan merge"),
      (3L, "merge scan table spark"),       // same multiset, different order
      (4L, "   "), (5L, "entirely different words here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.hashingVectors(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out.size === 5)
    out.values.foreach(v => assert(v.length === 64))
    assert(out(1L) === out(2L))               // exact copies
    assert(out(1L) === out(3L))               // bag-of-words: order-free
    assert(out(4L).forall(_ == 0L))           // empty doc → zero vector
    assert(out(1L) !== out(5L))
  }

  test("bigram LM score: hand-computed add-one ppm lattice") {
    import spark.implicits._
    // corpus: bigrams ab×3, ac×1, ba×1; c1(a)=4, c1(b)=1; V={a,b,c,z}=4
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"),
      (5L, null.asInstanceOf[String]), (6L, "a b a")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // ppm(ab) = (3+1)·10⁶ // (4+4) = 500000; ppm(ac) = 2·10⁶ // 8 =
    // 250000; ppm(ba) = 2·10⁶ // (1+4) = 400000
    assert(out(1L) === ((1L, 500000L)))
    assert(out(2L) === ((1L, 500000L)))
    assert(out(3L) === ((1L, 250000L)))
    assert(out(6L) === ((2L, 450000L))) // ⌊(500000+400000)/2⌋
    assert(out(4L) === ((0L, 0L)))      // single word: no bigrams
    assert(out(5L) === ((0L, 0L)))      // null text
  }

  test("Kneser-Ney LM: hand-computed lattice; seen-successor mass sums to 1") {
    import spark.implicits._
    // corpus: bigrams ab×2, ac×1 → c1(a)=3; n1w1(a)=2; cont(b)=cont(c)=1;
    // nbi=2. ppm(ab) = ((2·4−3)·2 + 3·2·1)·10⁶ // (4·3·2) = 16·10⁶//24 =
    // 666666; ppm(ac) = ((4−3)·2 + 3·2·1)·10⁶//24 = 8·10⁶//24 = 333333.
    // P(b|a)+P(c|a) = 24/24 = 1: KN's discounted+redistributed mass is
    // exactly conserved over the seen successors of a closed vocab.
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScoreKn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1L, 666666L)))
    assert(out(2L) === ((1L, 666666L)))
    assert(out(3L) === ((1L, 333333L)))
    assert(out(4L) === ((0L, 0L)))
    assert(out(5L) === ((0L, 0L)))
  }

  test("trigram Kneser-Ney: hand-computed lattice; seen-successor mass sums to 1") {
    import spark.implicits._
    // trigrams: "a b c"×2, "a b d"×1. Context "a b": c12=3, n12=2.
    // Continuation types: bt={(b c):1, (b d):1}; mid(b): nmid2=2, n2=2;
    // bot: n3(c)=n3(d)=1; nbb=2. pmidDen = 4·2·2 = 16.
    // ppm(abc) = ((4·2−3)·16 + 3·2·((4−3)·2 + 3·2·1))·10⁶ // (4·3·16)
    //          = 128·10⁶ // 192 = 666666
    // ppm(abd) = (16 + 6·8)·10⁶ // 192 = 64·10⁶ // 192 = 333333
    // P(c|ab)+P(d|ab) = (128+64)/192 = 1: discounted mass is conserved
    // over the seen successors of a closed vocabulary.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b d"), (4L, "x y"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScoreKn3(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1L, 666666L)))
    assert(out(2L) === ((1L, 666666L)))
    assert(out(3L) === ((1L, 333333L)))
    assert(out(4L) === ((0L, 0L)))      // 2 words: no trigrams
    assert(out(5L) === ((0L, 0L)))      // null text
  }

  test("trigram Kneser-Ney separates phrase structure a bigram can't") {
    import spark.implicits._
    // Both test docs have IDENTICAL bigram multisets relative to the
    // training corpus ("a b" and "b c" both seen), but only one has the
    // trained trigram "a b c"; the scrambled doc's "c b a" path scores
    // on different trigram types. The trigram model must rank the
    // in-order doc strictly higher.
    val train = (1L to 6L).map(i => (i, "a b c a b c"))
    val docs = (train :+ ((10L, "a b c")) :+ ((11L, "c b a"))
      :+ ((12L, "c a b"))).toDF("doc_id", "text")
    val out = TextAnalysis.lmScoreKn3(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(10L) > out(11L),
      s"in-order ${out(10L)} must outscore scrambled ${out(11L)}")
  }

  test("Kneser-Ney rewards versatile continuations over context-bound ones") {
    import spark.implicits._
    // "sf" is frequent but only ever follows "san"; "cat" follows many
    // contexts. Under add-one, P(sf|san) dwarfs P(cat|*) purely on raw
    // count; KN's continuation count keeps versatile "cat" competitive:
    // the RATIO kn(cat-doc)/kn(sf-doc) must exceed the add-one ratio.
    val ctx = Seq("red", "blue", "big", "old", "wet", "shy")
    val docs = (
      (1 to 6).map(i => (i.toLong, s"san sf")) ++
      ctx.zipWithIndex.map { case (c, i) => ((10 + i).toLong, s"$c cat") } :+
      ((100L, "san sf")) :+ ((101L, "red cat"))
    ).toDF("doc_id", "text")
    val kn = TextAnalysis.lmScoreKn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val addone = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val knRatio = kn(101L).toDouble / kn(100L).toDouble
    val aoRatio = addone(101L).toDouble / addone(100L).toDouble
    assert(knRatio > aoRatio,
      s"KN ratio $knRatio must exceed add-one ratio $aoRatio")
  }

  test("bigram LM score ranks corpus-typical text above gibberish") {
    import spark.implicits._
    val typical = "the quick brown fox jumps over the lazy dog"
    val docs = (1L to 8L).map(i => (i, typical)) :+
      ((9L, "zqx vbn wer tyu iop")) // bigrams seen once each
    val out = TextAnalysis.lmScore(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) > out(9L),
      s"repeated prose ${out(1L)} must outscore gibberish ${out(9L)}")
  }

  test("gopher battery: clean prose keeps, each rule trips on its own pathology") {
    import spark.implicits._
    val docs = Seq(
      // clean: 12 distinct words, stopword-rich, no symbols
      (1L, "the quick brown fox and the lazy dog ran with great speed"),
      (2L, "short"),                                      // too few words
      (3L, ("the and " + "a " * 40).trim),                // words too short
      (4L, "the @@ and ## fox $$ dog %% ran && with !! speed ?? over :: hill ;; far"), // symbol-heavy
      (5L, "zebra quagga okapi tapir bongo eland nyala kudu oryx addax dikdik gerenuk"), // no stopwords
      (6L, ("the fox " * 10 + "and and and and").trim)    // mostly duplicate words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFlags(docs, minWords = 10L).collect()
      .map(r => r.getLong(0) -> (1 to 6).map(r.getLong).toList).toMap
    assert(out(1L) === List(1L, 1L, 1L, 1L, 1L, 1L))
    assert(out(2L)(0) === 0L && out(2L).last === 0L)      // f_nwords trips
    assert(out(3L)(1) === 0L)                             // f_word_len trips
    assert(out(4L)(2) === 0L)                             // f_symbol trips
    assert(out(5L)(3) === 0L)                             // f_stopwords trips
    assert(out(6L)(4) === 0L)                             // f_dup_words trips
    assert(out.filterKeys(_ != 1L).values.forall(_.last == 0L))
  }

  test("trigram typicality: gibberish scores below prose, stats are exact") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the hat"),
      (3L, "the bat sat on the mat"),
      (4L, "qzxjvkwpfyqzxjvkwpfy"),   // gibberish: trigrams unique to it
      (5L, "no")                      // < 3 chars: drops
    ).toDF("doc_id", "text")
    val out = TextAnalysis.trigramTypicality(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(5L))
    // prose docs share most trigrams (df 2-3); the gibberish doc's
    // trigrams appear nowhere else (df 1, plus maybe a stray overlap)
    val prose = Seq(1L, 2L, 3L).map(out(_).getDouble(3))
    val junk = out(4L).getDouble(3)
    assert(prose.forall(_ > junk * 1.5), s"prose $prose vs junk $junk")
    // exact sufficient statistics: n_tris = distinct trigrams, df_sum ≥ n_tris
    out.values.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1))
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / r.getLong(1)) < 1e-12)
    }
    // determinism across invocations (distinct + checkpoint don't drift)
    val again = TextAnalysis.trigramTypicality(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.view.mapValues(_.getDouble(3)).toMap === again)
  }

  test("sentenceStats: terminator runs split; trailing text keeps its dot") {
    import spark.implicits._
    val d = Seq(
      (1L, "One two. Three four! Five?? Six."),
      (2L, "No terminators here"),
      (3L, "")).toDF("doc_id", "text")
    val m = TextAnalysis.sentenceStats(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    // "One two" (7) / "Three four" (10) / "Five" (4) / "Six." (4, keeps
    // the final dot — no trailing whitespace to consume it)
    assert(m(1L) === ((4L, 25L, 6.25, 10L)))
    assert(m(2L) === ((1L, 19L, 19.0, 19L)))
    assert(m(3L) === ((0L, 0L, 0.0, 0L)))
  }

  test("chunkBySentences: cumulative-char buckets never split a sentence") {
    import spark.implicits._
    // sentence lens 7, 10, 4: before = 0, 7, 17 → budget 10 gives
    // chunks 0 (s1+s2: before 0 and 7) and 1 (s3: before 17)
    val d = Seq((1L, "One two. Three four! Five.")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkBySentences(d, budget = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    assert(got === Seq(
      (0L, 2L, 17L, "One two Three four"),
      (1L, 1L, 5L, "Five.")))
  }

  test("blocklist: edge-stripped token match, frac4 ratio, any-hit drop") {
    import spark.implicits._
    val df = Seq(
      (1L, "the SLOW, query"),    // "slow," strips to a hit
      (2L, "all good here"),
      (3L, "(broken) and slow!"), // 2 hits of 3 words
      (4L, "")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.blocklistStats(df, Seq("slow", "broken"))
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) === 3L && r(0).getLong(2) === 1L &&
      r(0).getLong(4) === 1L)
    assert(r(1).getLong(2) === 0L && r(1).getLong(4) === 0L)
    assert(r(2).getLong(2) === 2L && r(2).getDouble(3) === 0.6666)
    assert(r(3).getLong(1) === 0L && r(3).getDouble(3) === 0.0 &&
      r(3).getLong(4) === 0L)
  }

  test("type-token ratio: exact distinct over lowercased words, frac4") {
    import spark.implicits._
    val df = Seq(
      ("a", "x Y x y"), ("a", "x z"), // 6 tokens, 3 types → 0.5
      ("b", "p q r"),                 // 3/3 → 1.0
      ("c", "")                       // no tokens → stratum absent
    ).toDF("source", "text")
    val r = TextAnalysis.typeTokenRatio(df, col("source")).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getDouble(3))).toMap
    assert(r("a") === ((6L, 3L, 0.5)))
    assert(r("b") === ((3L, 3L, 1.0)))
    assert(!r.contains("c") && r.size === 2)
  }

  test("char concentration: exact ppm endpoints of the HHI lattice") {
    def hhi(t: String): Long =
      one(t, TextAnalysis.charConcentration(col("text"))).asInstanceOf[Long]
    assert(hhi("aaaa") === 1000000L) // single-char spam pegs the index
    assert(hhi("ab") === 500000L)
    assert(hhi("abcd") === 250000L) // uniform over d chars → 10⁶/d
    assert(hhi("aab") === 555555L)  // (4+1)/9 on the floor lattice
    assert(hhi("") === 0L)
  }

  test("skipgram pairs: window fan-out and minCount gate are exact") {
    val docs = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val all = TextAnalysis.skipgramPairs(docs, window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1: d=1 → (a,b)(b,c)(c,d); d=2 → (a,c)(b,d); doc2: (a,b)
    assert(all(("a", "b")) === 2L)
    assert(all(("b", "c")) === 1L)
    assert(all(("a", "c")) === 1L)
    assert(all.values.sum === 6L)
    val gated = TextAnalysis.skipgramPairs(docs, window = 2, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gated === Set(("a", "b")))
  }

  test("PMI collocations: lattice ratio matches hand arithmetic") {
    // corpus: "x y" ×4 and "x z" ×1 (each its own doc)
    // unigrams: x=5, y=4, z=1, N_u=10; bigrams: (x y)=4, (x z)=1, N_b=5
    // pmi_ratio(x,y) = ⌊4·100·10⁶ / (5·5·4)⌋ = 4·10⁶
    val docs = (1L to 4L).map(i => (i, "x y")) :+ ((5L, "x z"))
    val out = TextAnalysis.pmiCollocations(docs.toDF("doc_id", "text"),
      minCount = 4L).collect()
    assert(out.length === 1) // (x z) is below minCount
    val r = out.head
    assert(r.getAs[String]("w_a") === "x" && r.getAs[String]("w_b") === "y")
    assert(r.getAs[Long]("c_xy") === 4L)
    assert(r.getAs[Long]("c_a") === 5L && r.getAs[Long]("c_b") === 4L)
    assert(r.getAs[Long]("pmi_ratio_q6") === 4000000L)
  }

  test("PMI: independent words sit at ratio 10⁶ (PMI 0) on the lattice") {
    // every bigram equally likely: "a b" and "b a" alternating
    val docs = (1L to 8L).map(i =>
      (i, if (i % 2 == 0) "a b" else "b a")).toDF("doc_id", "text")
    // unigrams: a=8, b=8, N_u=16; bigrams: (a b)=4, (b a)=4, N_b=8
    // ratio = ⌊4·256·10⁶/(8·8·8)⌋ = 2·10⁶ — doubled because bigram mass
    // splits over half the positions; the INDEPENDENT baseline in this
    // lattice is N_u²/(N_b·N_u) ≈ 2 when docs are 2 tokens long
    val out = TextAnalysis.pmiCollocations(docs, minCount = 4L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("pmi_ratio_q6")).toMap
    assert(out(("a", "b")) === 2000000L)
    assert(out(("b", "a")) === 2000000L)
  }

  test("script profile: planted CJK/Cyrillic dominate; ties and empties resolve fixed") {
    val docs = Seq(
      (1L, "hello \u4e16\u754c\u4e2d\u6587\u5b57\u7b26\u4e32\u4e86"), // 8 CJK > 5 latin
      (2L, "\u043f\u0440\u0438\u0432\u0435\u0442"),                    // cyrillic only
      (3L, "abc \u4e00\u4e8c\u4e09"),                                      // 3 latin = 3 cjk -> latin (priority)
      (4L, "12345 !!!"),                                                      // no script chars
      (5L, null.asInstanceOf[String]))                                        // null-safe
      .toDF("doc_id", "text")
    val r = TextAnalysis.scriptProfile(docs).collect()
      .map(x => x.getLong(0) -> x.getAs[String]("dominant")).toMap
    assert(r(1L) === "cjk")
    assert(r(2L) === "cyrillic")
    assert(r(3L) === "latin")
    assert(r(4L) === "none")
    assert(r(5L) === "none")
    val row1 = TextAnalysis.scriptProfile(docs)
      .filter(col("doc_id") === 1L).collect().head
    assert(row1.getAs[Long]("n_cjk") === 8L)
    assert(row1.getAs[Long]("n_latin") === 5L)
  }

  test("url domain stats: extraction, host parse, per-domain url vs doc counts") {
    val docs = Seq(
      (1L, "see http://a.com/x and http://a.com/y plus https://b.org/z"),
      (2L, "only http://a.com here"),
      (3L, "no links"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = TextAnalysis.urlDomainStats(docs).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("a.com") === ((3L, 2L))) // 3 urls across 2 docs
    assert(r("b.org") === ((1L, 1L)))
    assert(r.size === 2)
  }

  test("vocab spectrum: octaves are exact bit-lengths, unseen mass = n1/N ppm") {
    // counts: a x1 (octave 1), b x1 (octave 1), c x3 (octave 2), d x8 (octave 4)
    val docs = Seq((1L, "a b c c"), (2L, "c d d d d"), (3L, "d d d d"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.vocabSpectrum(docs).collect()
      .map(x => x.getAs[Number]("octave").longValue ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === ((2L, 2L, 153846L))) // n1=2, N=13 -> floor(2e6/13)
    assert(r(2L) === ((1L, 3L, 153846L)))
    assert(r(4L) === ((1L, 8L, 153846L)))
    assert(r.size === 3)
  }

  test("facet vocab overlap: jaccard on the q4 floor lattice, ordered pairs once") {
    val docs = Seq(
      (1L, "s1", "x y z"), (2L, "s2", "x y w"), (3L, "s3", "q"))
      .toDF("doc_id", "src", "text")
    val r = TextAnalysis.facetVocabOverlap(docs, col("src")).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4),
          x.getAs[Double]("jaccard")))).toMap
    assert(r(("s1", "s2")) === ((2L, 3L, 3L, 0.5)))   // {x,y} over {x,y,z,w}
    assert(!r.contains(("s2", "s1")))                  // each pair once
    assert(!r.contains(("s1", "s3")))                  // disjoint -> no row
    assert(r.size === 1)
  }

  test("LIX readability: hand lattice values, common-denominator floor") {
    // "the colonel proceeds. immediately afterwards attack." :
    // sentences = 2, words = 6, long(>=7) = 4
    // lix_q4 = floor((36 + 100*4*2)*1e4 / 12) = floor(8360000/12)... 
    val docs = Seq(
      (1L, "the colonel proceeds. immediately afterwards attacking. qq"),
      (2L, "a b. c d."),      // no long words -> lix = w/s = 2.0
      (3L, ""),               // empty -> 0
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getAs[Double]("lix"))))
      .toMap
    // doc 1: words=7 (whitespace split KEEPS trailing punctuation, so
    // "proceeds." is 9 chars), sentences=3, long(>=7)=5
    // lix_q4 = floor((49 + 100*5*3)*1e4/21) = floor(15490000/21) = 737619
    assert(r(1L) === ((7L, 3L, 5L, 73.7619)))
    assert(r(2L) === ((4L, 2L, 0L, 2.0)))
    assert(r(3L) === ((0L, 0L, 0L, 0.0)))
    assert(r(4L) === ((0L, 0L, 0L, 0.0)))
  }

  test("heapsCurve: hand-traced buckets, first-seen types, cumulatives") {
    import org.apache.spark.sql.functions.col
    // ids 0..3, 2 buckets -> {0,1} and {2,3}; types a,b,c first seen in
    // bucket 0, d first in bucket 1
    val docs = Seq((0L, "a b"), (1L, "b c"), (2L, "c d"), (3L, "a a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.heapsCurve(docs, buckets = 2)
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((0L, 4L, 3L, 4L, 3L), (1L, 4L, 1L, 8L, 4L)))
  }
}
