package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference PRIORITY-QUEUE BPE apply (Sennrich et al.): repeatedly
    * find the lowest-RANK merge whose pair is adjacent anywhere in the
    * token list, merge all its occurrences left-to-right, repeat. The
    * engine applies each rule once, globally, in rank order — this
    * reference validates the equivalence argument for well-formed
    * tables, not just the outputs. */
  private def referenceBpe(word: String): Seq[String] = {
    var toks: Vector[String] = word.map(_.toString).toVector
    val rank = Bpe.merges.zipWithIndex.toMap
    var done = false
    while (!done) {
      val present = toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))))
      if (present.isEmpty) done = true
      else {
        val (l, r) = Bpe.merges(present.min)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
    }
    toks
  }

  private def pieces(text: String): Seq[String] =
    TextAnalysis.bpeTokenRegex.r.findAllIn(text.toLowerCase).toSeq

  private def engineTokens(texts: Seq[String]): Map[String, Seq[String]] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"t", Bpe.tokens($"t").as("toks"), Bpe.tokenCount($"t").as("n"))
      .collect()
      .map(r => r.getString(0) -> {
        val toks = r.getSeq[String](1)
        assert(r.getLong(2) === toks.length.toLong,
          s"count/tokens disagree for '${r.getString(0)}'")
        toks
      }).toMap

  test("hand-traced merges: common words collapse, rare ones stay chars") {
    val got = engineTokens(Seq("the", "thin", "other", "zzzz", "a1,b", ""))
    assert(got("the") === Seq("the"))
    assert(got("thin") === Seq("th", "in"))
    assert(got("other") === Seq("o", "ther"))
    assert(got("zzzz") === Seq("z", "z", "z", "z"))
    assert(got("a1,b") === Seq("a", "1", ",", "b"))
    assert(got("") === Seq.empty)
  }

  test("engine tokenization equals the reference priority-queue BPE") {
    val wordGen = Gen.chooseNum(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaLowerChar, 2 -> Gen.oneOf("etaoinshr".toSeq)))
        .map(_.mkString))
    val textGen = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val samples = Gen.listOfN(200, textGen).sample.get.distinct
    val got = engineTokens(samples)
    samples.foreach { t =>
      val expect = pieces(t).flatMap(referenceBpe)
      assert(got(t) === expect, s"text '$t'")
      // lossless within pieces: tokens re-concatenate to the pieces
      assert(got(t).mkString === pieces(t).mkString, s"lossy for '$t'")
    }
  }

  /** Reference dict-based BPE TRAINER (Sennrich learn-time): weighted
    * word dict as token lists; each step counts adjacent pairs, merges
    * the arg-max — (count desc, left asc, right asc), the engine's tie
    * rule — left-to-right non-overlapping in every word. */
  private def referenceTrain(texts: Seq[String],
      numMerges: Int): Seq[(String, String, Long)] = {
    var dict: Map[Vector[String], Long] = texts.flatMap(pieces)
      .groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, c) => w.map(_.toString).toVector -> c }
    val learned = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (toks, c) =>
        toks.indices.dropRight(1).foreach { i =>
          val p = (toks(i), toks(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        learned += ((l, r, c))
        dict = dict.map { case (toks, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += toks(i); i += 1 }
          }
          out.result() -> c
        }
        k += 1
      }
    }
    learned.result()
  }

  test("distributed training matches the reference dict trainer") {
    val corpus = Seq(
      "low lower lowest low low", "new newer newest new",
      "wide wider widest", "low newer new lowest",
      "es es es est est")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(df, numMerges = 10)
    val expect = referenceTrain(corpus, numMerges = 10)
    assert(got === expect)
  }

  test("train → tokensWith round-trips: applying learned merges yields the trained segmentation") {
    val corpus = Seq("banana bandana ban", "banana banana cabana")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val learned = Bpe.train(df, numMerges = 6).map { case (l, r, _) => (l, r) }
    // reference: replay the same merges through the dict trainer's apply
    val applied = df
      .select($"text", Bpe.tokensWith($"text", learned).as("toks")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    def refApply(word: String): Seq[String] = {
      var toks: Vector[String] = word.map(_.toString).toVector
      learned.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks
    }
    corpus.foreach { t =>
      assert(applied(t) === pieces(t).flatMap(refApply), s"text '$t'")
    }
  }

  test("training exhausts gracefully when no pairs remain") {
    // single-char words only → zero adjacent pairs anywhere
    val df = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    assert(Bpe.train(df, numMerges = 5) === Seq.empty)
    assert(Bpe.trainIterative(df, numMerges = 5) === Seq.empty)
  }

  test("driver-loop train ≡ fully-distributed trainIterative (VERDICT r10 #4)") {
    val corpus = Seq(
      "low lower lowest low low", "new newer newest new",
      "wide wider widest", "low newer new lowest")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    assert(Bpe.train(df, numMerges = 8) === Bpe.trainIterative(df, numMerges = 8))
  }

  test("a 1k-merge train completes driver-side in seconds (scale shape)") {
    // 26² two-letter words × weights → thousands of distinct pairs; the
    // greedy loop runs to pair exhaustion well before 1000 merges on
    // this vocab, proving the loop cost is driver-memory, not Spark jobs
    val letters = 'a' to 'z'
    val corpus = (for { a <- letters; b <- letters }
      yield s"$a$b${a}${b}").grouped(40).map(_.mkString(" ")).toSeq
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val learned = Bpe.train(df, numMerges = 1000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(learned.nonEmpty)
    assert(secs < 30.0, s"1k-merge train took $secs s")
  }

  test("mixed digits and punctuation: digits single, punct isolated") {
    val got = engineTokens(Seq("It costs $12.50, really!"))
    assert(got("It costs $12.50, really!") ===
      Seq("it", "co", "st", "s", "$", "1", "2", ".", "5", "0", ",",
        "re", "ally", "!"))
  }

  // ------------------------------------------------- byte-level face

  test("byteAliases is exactly GPT-2 bytes_to_unicode") {
    assert(Bpe.byteAliases.size === 256)
    assert(Bpe.byteAliases.distinct.size === 256) // a bijection
    // printable latin-1 bytes alias to themselves
    assert(Bpe.byteAliases('a'.toInt) === 'a')
    assert(Bpe.byteAliases('!'.toInt) === '!')
    assert(Bpe.byteAliases(0xfe) === 0xfe.toChar)
    // the famous GPT-2 aliases: NUL→Ā (256+0), space→Ġ (256+32)
    assert(Bpe.byteAliases(0) === 'Ā')
    assert(Bpe.byteAliases(32) === 'Ġ')
    // every alias is printable (≥ 33, never a control char or space)
    assert(Bpe.byteAliases.forall(c => c >= 33 && !c.isControl))
  }

  test("byteAlias column form matches the driver-side table on any bytes") {
    val texts = Seq("hello", "café", "naïve £5", " tabs\there")
    val got = texts.toDF("t")
      .select($"t", Bpe.byteAlias($"t").as("a")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    texts.foreach(t => assert(got(t) === Bpe.aliasOf(t), s"for '$t'"))
  }

  test("byte face ≡ char face on ASCII; byte-splits non-ASCII, no [UNK]") {
    val ascii = "It costs $12.50, really!"
    val accented = "café"
    val rows = Seq(ascii, accented).toDF("t")
      .select($"t", Bpe.tokens($"t").as("ct"), Bpe.tokensBytes($"t").as("bt"),
        Bpe.tokenCountBytes($"t").as("bn"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](1), r.getSeq[String](2), r.getLong(3)))).toMap
    // ASCII: identical token sequences (aliases are the chars themselves)
    val (ct, bt, bn) = rows(ascii)
    assert(bt === ct)
    assert(bn === ct.size.toLong)
    // non-ASCII: 'é' (2 UTF-8 bytes) byte-splits into its two aliases —
    // Ã (0xC3, printable-latin self-alias) + © (0xA9) — where the char
    // face holds one opaque char; nothing ever maps to an [UNK]
    val (cAcc, bAcc, _) = rows(accented)
    assert(cAcc === Seq("c", "a", "f", "é"))
    assert(bAcc === Seq("c", "a", "f", "Ã", "©"))
  }

  test("byte-face count/digest agree with the token array") {
    val texts = Seq("the theory of things", "", "a1!")
    val got = texts.toDF("t")
      .select($"t", Bpe.tokensBytes($"t").as("toks"),
        Bpe.tokenCountBytes($"t").as("n"), Bpe.tokenDigestBytes($"t").as("d"))
      .collect()
    got.foreach { r =>
      val toks = r.getSeq[String](1).filter(_.nonEmpty)
      assert(r.getLong(2) === toks.size.toLong, s"for '${r.getString(0)}'")
      assert(r.getString(3) != null)
    }
  }
}
