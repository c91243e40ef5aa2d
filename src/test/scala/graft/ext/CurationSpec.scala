package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("priority sample: bounded k, zero-weight drop, and the top-k merge law") {
    val docs = (1L to 500L).map(i => (i, (i % 7) * 100L))
      .toDF("doc_id", "n_chars")
    val full = Curation.prioritySample(docs, 50, "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(full.size === 50)
    // zero-weight rows (i % 7 == 0) can never be sampled
    assert(full.forall(_._2 > 0L))
    // deterministic
    val again = Curation.prioritySample(docs, 50, "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again === full)
    // the monoid law the streaming sink rests on: top-k of the union ==
    // top-k over the two halves' top-k samples
    val a = Curation.prioritySample(docs.filter($"doc_id" <= 250), 50, "n_chars")
    val b = Curation.prioritySample(docs.filter($"doc_id" > 250), 50, "n_chars")
    val merged = a.unionByName(b)
      .orderBy(col("priority"), col("doc_id")).limit(50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged === full)
    // priorities sit on the documented lattice: floor(h * 10^4 / w)
    def hexIntOf(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16)
    full.foreach { case (id, w, pri) =>
      assert(pri === hexIntOf(s"pri:$id") * 10000L / w, s"doc $id")
    }
  }

  test("stratified sample is deterministic, rate-bounded, and stratum-aware") {
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "the a of" else "zz qq"))
      .toDF("doc_id", "text")
    val stratum = TextAnalysis.langId(col("text"))
    val once = Curation.stratifiedSample(docs, stratum, Map("en" -> 50), 10).collect()
    val twice = Curation.stratifiedSample(docs, stratum, Map("en" -> 50), 10).collect()
    assert(once.map(_.getLong(0)).sorted.sameElements(twice.map(_.getLong(0)).sorted))
    val byStratum = once.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // 500 en docs at 50% and 500 und docs at 10% — hash rates land close
    assert(byStratum("en") > 200 && byStratum("en") < 300, byStratum)
    assert(byStratum("und") > 20 && byStratum("und") < 90, byStratum)
    once.foreach(r => assert(r.getLong(2) < (if (r.getString(1) == "en") 50 else 10)))
  }

  test("tf-idf ranks the rare term above the ubiquitous one") {
    // 'common' appears in all docs (idf 1); each doc has its own rare term
    val docs = (0L until 10L).map(i => (i, s"common common rare$i")).toDF("doc_id", "text")
    val top = Curation.tfidfTopTerms(docs, k = 1).collect()
    assert(top.length === 10)
    top.foreach { r =>
      assert(r.getString(1) === s"rare${r.getLong(0)}") // rare term wins despite tf=1 vs 2
      assert(r.getDouble(3) === 10.0) // 1 * 10 / 1
    }
  }

  test("bm25: tf saturates, length normalizes, non-matches drop out") {
    val docs = Seq(
      (1L, "apple pad"),                                  // tf 1, dl 2
      (2L, "apple apple apple pad"),                      // tf 3, dl 4
      (3L, "apple pad pad pad"),                          // tf 1, dl 4
      (4L, "apple f1 f2 f3 f4 f5 f6 f7 f8 f9"),           // tf 1, dl 10
      (5L, "durian durian durian")                        // no query term
    ).toDF("doc_id", "text")
    val out = Curation.bm25TopDocs(docs, Seq(0L -> Seq("apple")), k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(!out.contains(5L), "non-matching doc must not be scored")
    assert(out(2L) > out(3L), s"higher tf at equal length must win: $out")
    assert(out(2L) < 3 * out(3L), s"tf gain must saturate below linear: $out")
    assert(out(1L) > out(4L), s"shorter doc at equal tf must win: $out")
  }

  test("bm25: rarer term contributes more at equal tf and length") {
    // 'rare' in 1 doc, 'common' in all 4; probe docs have identical
    // length and tf for their respective terms
    val docs = Seq(
      (1L, "rare common x"),
      (2L, "cc common y"),
      (3L, "dd common z"),
      (4L, "ee common w")
    ).toDF("doc_id", "text")
    val out = Curation.bm25TopDocs(docs, Seq(0L -> Seq("rare", "common")), k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L), s"rare+common doc must outrank common-only: $out")
    val commonOnly = Seq(out(2L), out(3L), out(4L))
    assert(commonOnly.distinct.size == 1,
      s"equal tf/dl/df docs must tie exactly: $out")
  }

  test("rrf fusion: consensus docs outrank single-list docs; scores are exact") {
    // list A ranks docs 10,11,12; list B ranks 11,12,13 — doc 11 (rank 2+1)
    // must beat every single-list doc, and each score must equal the
    // integer-lattice sum floor(1e6/(60+r))/1e6
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val b = Seq((0L, 11L, 1L), (0L, 12L, 2L), (0L, 13L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val out = Curation.rrfFuse(Seq(a, b), k = 10).collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    def rr(r: Long): Double = (1000000L / (60L + r)).toDouble / 1e6
    assert(out(11L)._1 === rr(2) + rr(1))
    assert(out(12L)._1 === rr(3) + rr(2))
    assert(out(10L)._1 === rr(1))
    assert(out(13L)._1 === rr(3))
    assert(out(11L)._2 === 2L && out(10L)._2 === 1L, "n_lists must count sources")
    // consensus beats the best single-list rank-1 doc
    assert(out(11L)._1 > out(10L)._1)
    val ranks = out.map { case (d, (_, _, rnk)) => d -> rnk }
    assert(ranks(11L) === 1L && ranks(12L) === 2L, s"fused order wrong: $out")
  }

  test("PII redaction replaces emails and phones and counts them") {
    val docs = Seq(
      (1L, "mail me at a.b+c@x-mail.example.org today"),
      (2L, "call 555-123-4567 or 555-999-0000"),
      (3L, "no pii here; not-a-phone 12-345-6789 and half@domain")
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
      Curation.emailCount($"text").as("ne"), Curation.phoneCount($"text").as("np"),
      Curation.redactPii($"text").as("clean")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((1L, 0L, "mail me at [EMAIL] today")))
    assert(out(2L) === ((0L, 2L, "call [PHONE] or [PHONE]")))
    assert(out(3L)._1 === 0L && out(3L)._2 === 0L)
    assert(out(3L)._3 === "no pii here; not-a-phone 12-345-6789 and half@domain")
  }

  test("token chunking: window/stride math, overlap, and tails") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens → 2 chunks
      (2L, "a b c"),                                    // under one window
      (3L, "")                                          // no chunks
    ).toDF("doc_id", "text")
    val out = Curation.chunkTokens(docs, chunkSize = 64, stride = 48).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out.size === 3)
    assert(out((1L, 0L))._1 === 64L)
    assert(out((1L, 0L))._2.startsWith("t1 ") && out((1L, 0L))._2.endsWith(" t64"))
    assert(out((1L, 1L))._1 === 52L) // tokens 49..100, overlap of 16
    assert(out((1L, 1L))._2.startsWith("t49 ") && out((1L, 1L))._2.endsWith(" t100"))
    assert(out((2L, 0L)) === ((3L, "a b c")))
  }

  test("normalizeText collapses whitespace and lowercases; novelAgainst gates on content") {
    val n = Seq("  Foo\t\tBar \n baz  ").toDF("text")
      .select(Curation.normalizeText(col("text"))).first().getString(0)
    assert(n === "foo bar baz")
    val docs = Seq((1L, "same text"), (2L, "brand new"), (3L, "same text"))
      .toDF("doc_id", "text")
    val known = Seq((99L, "same text")).toDF("doc_id", "text")
    val novel = Dedup.novelAgainst(docs, known).collect().map(_.getLong(0)).toSet
    assert(novel === Set(2L)) // both copies of the known text drop
    val emptyKnown = known.filter(lit(false))
    assert(Dedup.novelAgainst(docs, emptyKnown).count() === 3)
  }

  test("duplicate clusters: transitive chain collapses to one min-labeled component") {
    // three docs share enough shingles pairwise-adjacent to chain a-b-c;
    // d is unrelated and labels itself. 30-word base → pairwise Jaccard
    // ≈ 0.97, so the 4x4 LSH banding finds both chain edges w.p. > 99.9%
    val base = (0 until 30).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (10L, base),
      (11L, base + " extra"),
      (12L, base + " extra more"),
      (99L, "totally different words with no overlap at all whatsoever here")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateClusters(docs, threshold = 0.3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) === 10L && out(11L) === 10L && out(12L) === 10L)
    assert(out(99L) === 99L)
  }

  test("mixture resampling keeps the binding stratum whole and downsamples the rest") {
    // 600 a / 200 b at 50:50 → b binds: T = 400, b kept in full (ppm 10⁶),
    // a downsampled to ~200 (ppm 333333). c has no weight and vanishes.
    val docs = ((0L until 600L).map(i => (i, "a")) ++
      (600L until 800L).map(i => (i, "b")) ++
      (800L until 850L).map(i => (i, "c"))).toDF("doc_id", "lang")
    val once = Curation.resampleToMix(docs, col("lang"),
      Map("a" -> 50, "b" -> 50)).collect()
    val twice = Curation.resampleToMix(docs, col("lang"),
      Map("a" -> 50, "b" -> 50)).collect()
    assert(once.map(_.getLong(0)).sorted.sameElements(twice.map(_.getLong(0)).sorted))
    val by = once.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(by("b") === 200, by)               // binding stratum fully kept
    assert(by("a") > 160 && by("a") < 240, by) // hash noise around 200
    assert(!by.contains("c"))
    once.filter(_.getString(1) == "b").foreach(r => assert(r.getLong(2) === 1000000L))
    once.filter(_.getString(1) == "a").foreach(r => assert(r.getLong(2) === 333333L))
  }

  test("top-quality gate: exact keeps ceil-free 30% per stratum; approx agrees away from the cut") {
    // distinct quality per doc within each stratum (monotone punctuation
    // penalty) — a tie plateau at the cut would legitimately widen the
    // threshold gate and obscure the exact/approx comparison
    val docs = (0L until 200L).map { i =>
      val lang = if (i % 2 == 0) "en" else "es"
      (i, "the a of to in is it and " + ("!" * (1 + (i / 2).toInt)), lang)
    }.toDF("doc_id", "text", "lang")
    val exact = Curation.topQualityPerGroup(docs, col("lang"), keepPpm = 300000L)
      .collect()
    val byStratum = exact.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byStratum("en") === 30 && byStratum("es") === 30) // ⌊0.3·100⌋
    // every kept doc outranks every dropped doc within its stratum
    exact.foreach(r => assert(r.getLong(3) <= 30))
    val approx = Curation.topQualityPerGroupApprox(docs, col("lang"),
      keepPpm = 300000L).collect()
    val exactIds = exact.map(_.getLong(0)).toSet
    val approxIds = approx.map(_.getLong(0)).toSet
    // same gate within sketch tolerance: symmetric difference is a sliver
    assert((exactIds diff approxIds).size + (approxIds diff exactIds).size <= 20,
      s"exact=${exactIds.size} approx=${approxIds.size}")
  }

  test("boilerplate: per-source common words flagged, cross-source words are not") {
    // 'nav' is in every docs.com doc (df 3/3 ≥ 50%) but only one blog.net
    // doc (1/2 < 50%) — boilerplate is per-source, not global
    val docs = Seq(
      (1L, "nav home alpha", "docs.com"),
      (2L, "nav home beta", "docs.com"),
      (3L, "nav gamma delta", "docs.com"),
      (4L, "nav epsilon", "blog.net"),
      (5L, "zeta eta", "blog.net"),
      (6L, "theta iota", "blog.net")
    ).toDF("doc_id", "text", "source")
    val r = Curation.boilerplateStats(docs, n = 1, ratioQ4 = 5000L).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    // docs.com boilerplate = {nav, home? home df=2/3 ≥ 50% yes}
    assert(r(1L) === ((3L, 2L, 0.6666)))
    assert(r(3L) === ((3L, 1L, 0.3333)))
    // blog.net: no word reaches 50% of 2 docs except none (all df=1)
    assert(r(4L)._2 === 0L && r(5L)._2 === 0L)
  }

  test("corpus report: rollup rows with exact integer-mean quality") {
    val docs = Seq(
      (1L, "the a and of to in is it", "s1", "en"),
      (2L, "the a and of to in is it", "s1", "en"),
      (3L, "uno dos tres", "s1", "es"),
      (4L, "the a and", "s2", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val rows = Curation.corpusReport(docs).collect()
    // 3 leaf groups + 2 source subtotals + 1 grand total
    assert(rows.length === 6)
    val grand = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getLong(2) === 4L)
    assert(grand.getLong(4) === 3L) // docs 1,2 share a digest
    val q4s = docs.select(TextAnalysis.qualityScoreQ4(col("text"))).collect()
      .map(_.getLong(0))
    assert(grand.getDouble(5) === (q4s.sum / 4L) / 10000.0)
  }

  test("sequence packing: every doc lands once, offsets stay under budget, bins overflow by at most one doc") {
    // 40 docs x 10 tokens, budget 16 → every sequence takes 1-2 docs
    val docs = (0L until 40L)
      .map(i => (i, (0 until 10).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.packSequences(docs, budgetTokens = 16, buckets = 4).collect()
    assert(out.length === 40)
    assert(out.map(_.getLong(0)).distinct.length === 40)
    out.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) < 16, r)  // seq_offset < budget
    }
    // a doc starting inside a bin belongs to it wholly: bin fill ≤ budget + maxdoc - 1
    val fills = out.groupBy(r => (r.getLong(1), r.getLong(3)))
      .view.mapValues(_.map(_.getLong(2)).sum)
    fills.foreach { case (k, f) => assert(f <= 16 + 10 - 1, s"$k overfilled: $f") }
    // empty docs carry nothing and drop
    val withEmpty = docs.union(Seq((999L, "   ")).toDF("doc_id", "text"))
    assert(Curation.packSequences(withEmpty, 16, 4).count() === 40)
  }

  test("hash split: total partition, ~80/10/10, stable under corpus growth") {
    val docs = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Curation.hashSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.size === 1000)
    val counts = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900, counts)
    assert(counts("val") > 50 && counts("val") < 160, counts)
    assert(counts("test") > 50 && counts("test") < 160, counts)
    // adding docs never reassigns existing ones
    val grown = (0L until 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val again = Curation.hashSplit(grown).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out.foreach { case (id, s) => assert(again(id) === s) }
    // a different salt draws a different split
    val salted = Curation.hashSplit(docs, salt = "exp2").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.exists { case (id, s) => salted(id) != s })
  }

  test("hash split rejects degenerate percentages; cap groups null strata together") {
    intercept[IllegalArgumentException](
      Curation.hashSplit(Seq((1L, "x")).toDF("doc_id", "text"), trainPct = 0))
    intercept[IllegalArgumentException](
      Curation.hashSplit(Seq((1L, "x")).toDF("doc_id", "text"),
        trainPct = 90, valPct = 10))
    intercept[IllegalArgumentException](
      Curation.capPerGroup(Seq((1L, "a", "x")).toDF("doc_id", "source", "text"),
        col("source"), cap = 0))
    // null sources form one stratum and respect the cap like any other
    val docs = Seq((1L, null.asInstanceOf[String], "the and is of to"),
      (2L, null.asInstanceOf[String], "zz"), (3L, "b", "hello world"))
      .toDF("doc_id", "source", "text")
    val out = Curation.capPerGroup(docs, col("source"), cap = 1).collect()
    assert(out.length === 2)
    assert(out.count(_.isNullAt(0)) === 1)
    assert(out.find(_.isNullAt(0)).get.getLong(1) === 1L) // quality-rich doc wins
  }

  test("per-group cap keeps at most `cap` per stratum, highest quality first") {
    val docs = Seq(
      (1L, "a", "the and is of to in it for on this was with as"), // stopword-rich
      (2L, "a", "zz@@##"), (3L, "a", "qq!!**"), (4L, "b", "hello world")
    ).toDF("doc_id", "source", "text")
    val out = Curation.capPerGroup(docs, col("source"), cap = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.count(_._1 == "a") === 2)
    assert(out.count(_._1 == "b") === 1)
    // the quality-rich doc 1 holds rank 1 in stratum a
    assert(out.contains(("a", 1L, 1L)))
  }

  test("per-group cap on a 90%-one-key corpus: no window task reads >2x the mean (salted)") {
    // one hot domain holds 90% of the corpus — the case that funnels a
    // plain per-stratum window into a single task (VERDICT r4 item 8)
    val n = 4000
    val docs = (0 until n).map { i =>
      val s = if (i % 10 == 0) s"cold${i % 7}" else "hot"
      (i.toLong, s, s"doc number $i words vary ${"x " * (i % 17)}")
    }.toDF("doc_id", "source", "text")

    // salted and unsalted (saltFactor=1 = the old single-window plan)
    // agree exactly — the guard changes placement, never results
    val expect = Curation.capPerGroup(docs, col("source"), cap = 25,
        saltFactor = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    // measure REAL per-task shuffle-read record counts; AQE off so small
    // partitions aren't coalesced away from the 16-partition layout the
    // claim is about
    val taskReads = scala.collection.concurrent.TrieMap.empty[(Int, Long), Long]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val recs = te.taskMetrics.shuffleReadMetrics.recordsRead
        if (recs > 0) taskReads.put((te.stageId, te.taskInfo.taskId), recs)
      }
    }
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      // salt granularity ≫ partition count: each task then averages many
      // small (stratum, salt) slices, so hash-placement collisions even
      // out (16 coarse slices into 16 partitions would land 2-4 on one
      // task — balls-in-bins, not residual key skew). Production sizing
      // rule: saltFactor ≥ ~16× the reducer count a hot stratum should
      // spread over; the default (16) suits modest skew.
      val got = Curation.capPerGroup(docs, col("source"), cap = 25,
          saltFactor = 256).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(got === expect)
      // listener events are async; wait until the phase-1 stage's reads
      // are visible (≥ saltFactor·cap survivors), plus a grace period
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (taskReads.values.sum < 16 * 25 && System.nanoTime() < deadline)
        Thread.sleep(50)
      Thread.sleep(500)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // the heaviest shuffle stage is the phase-1 window — the only stage
    // whose task load grows with the corpus (Spark's map-side
    // WindowGroupLimit caps it at mappers·cap per (stratum, salt) group;
    // unsalted, ALL of the hot stratum's surviving rows land on one
    // task). Phase 2 is bounded at saltFactor·cap rows per stratum by
    // construction, corpus-independent, so its skew is a constant.
    val byStage = taskReads.toSeq.groupBy(_._1._1)
      .map { case (_, xs) => xs.map(_._2) }
    val heaviest = byStage.maxBy(_.sum)
    assert(heaviest.sum >= 1000,
      s"expected the salted window stage, saw totals ${byStage.map(_.sum)}")
    val mean = heaviest.sum.toDouble / heaviest.size
    assert(heaviest.max <= 2.0 * mean,
      s"skewed task: max=${heaviest.max} mean=$mean tasks=${heaviest.size}")
  }

  test("temperature schedule: exact isqrt, ppm shares, head/tail rebalance") {
    import spark.implicits._
    // head: 10000 docs, tail: 100 docs → natural ratio 100×, smoothed 10×
    val docs = ((1 to 10000).map(i => (i.toLong, "head")) ++
      (1 to 100).map(i => (10000L + i, "tail")))
      .toDF("doc_id", "source")
    val sched = Curation.temperatureSchedule(docs, "source", budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nH, sH, wH, pH) = sched("head")
    val (nT, sT, wT, pT) = sched("tail")
    assert((nH, sH) === (10000L, 100L)) // perfect square: isqrt exact
    assert((nT, sT) === (100L, 10L))
    assert(wH === 909090L && wT === 90909L) // 100/110, 10/110 on ppm lattice
    assert(pH === 909L && pT === 90L)
    assert(wH + wT <= 1000000L)
    // smoothing: head is 100x the docs but only 10x the sampling mass
    assert(wH / wT === 10L)
  }

  test("isqrt correction is exact around perfect squares") {
    import spark.implicits._
    val ns = Seq(1L, 2L, 3L, 4L, 8L, 9L, 10L, 99L, 100L, 101L, 1048576L)
    val docs = ns.zipWithIndex.flatMap { case (n, g) =>
      (1L to n).map(i => (g * 10000000L + i, s"g$g"))
    }.toDF("doc_id", "source")
    val got = Curation.temperatureSchedule(docs, "source").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    ns.foreach { n =>
      val s = got(n)
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s")
    }
  }

  test("dsir: target-distinct vocabulary scores above raw-distinct") {
    import spark.implicits._
    // Counts must DOMINATE the add-one smoothing mass (B pseudo-counts
    // in each denominator) for the ratio to leave the ~1.0 neutral zone,
    // so the fixture repeats its vocabulary 5-10× against B = 64.
    val docs = Seq(
      (1L, Seq.fill(10)("apple banana").mkString(" "), true),
      (2L, Seq.fill(5)("apple banana cherry").mkString(" "), true),
      (3L, Seq.fill(10)("zebra yak").mkString(" "), false),
      (4L, "apple apple zebra zebra", false),
      (5L, "", false)
    ).toDF("doc_id", "text", "is_t")
    val r = Curation.dsirWeights(docs, col("is_t"), buckets = 64)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // pure-target vocab: ratio > 1 → targetlike
    assert(r(1L)._2 > 1000000L && r(1L)._3 === 1L, r(1L).toString)
    // pure-raw vocab: ratio < 1 → dropped
    assert(r(3L)._2 < 1000000L && r(3L)._3 === 0L, r(3L).toString)
    // mixed doc sits strictly between the extremes
    assert(r(4L)._2 > r(3L)._2 && r(4L)._2 < r(1L)._2, r(4L).toString)
    // empty doc: no grams, score 0, never selected
    assert(r(5L) === ((0L, 0L, 0L)))
    assert(r(1L)._1 === 20L && r(4L)._1 === 4L)
  }

  test("dsir frozen scoring: self-score equals dsirWeights; unseen " +
      "buckets get the smoothing default") {
    import spark.implicits._
    val model = Seq(
      (1L, Seq.fill(10)("apple banana").mkString(" "), true),
      (2L, Seq.fill(5)("apple banana cherry").mkString(" "), true),
      (3L, Seq.fill(10)("zebra yak").mkString(" "), false),
      (4L, "apple apple zebra zebra", false)
    ).toDF("doc_id", "text", "is_t")
    val self = Curation.dsirScore(model, col("is_t"), model, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val base = Curation.dsirWeights(model, col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(self === base) // wrapper ≡ frozen face scored on itself
    // a doc of model-unseen words scores at the 0-count smoothing
    // ratio ⌊10⁶·(nr+B)/(nt+B)⌋ = ⌊10⁶·123/99⌋ (nt=35, nr=59, B=64)
    val inc = Seq((10L, "qq ww")).toDF("doc_id", "text")
    val got = Curation.dsirScore(model, col("is_t"), inc, buckets = 64)
      .collect()(0)
    assert(got.getLong(1) === 2L)
    assert(got.getLong(2) === 1242424L, got.toSeq.toString)
  }

  test("shard assignment: LPT round-robin balances adjacent sizes") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 9L), (3L, 8L), (4L, 7L), (5L, 6L),
      (6L, 5L), (7L, 10L)).toDF("doc_id", "n_chars")
    val r = Curation.shardAssign(df, nShards = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    // rank order (size desc, id asc): 1, 7, 2, 3, 4, 5, 6
    assert(r(1L) === 0L && r(7L) === 1L && r(2L) === 2L)
    assert(r(3L) === 0L && r(4L) === 1L && r(5L) === 2L && r(6L) === 0L)
  }

  test("k-anonymity: class sizes counted, sub-k classes flagged") {
    import spark.implicits._
    val df = Seq(
      ("en", "a"), ("en", "a"), ("en", "a"),
      ("de", "a"),
      ("en", "b"), ("en", "b")
    ).toDF("lang", "source")
    val r = Curation.kAnonymity(df, Seq("lang", "source"), k = 2)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3))).toMap
    assert(r(("en", "a")) === ((3L, 0L)))
    assert(r(("de", "a")) === ((1L, 1L))) // singleton re-identifies
    assert(r(("en", "b")) === ((2L, 0L))) // exactly k is compliant
    assert(r.size === 3)
  }

  test("export manifest: digest is order-independent and moves on any corruption") {
    val docs = (1L to 40L).map(i => (i, s"doc number $i", 10L + i))
      .toDF("doc_id", "text", "n_chars")
    val m1 = Curation.exportManifest(docs, nShards = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // row-order permutation cannot move any digest (sum is commutative)
    val m2 = Curation.exportManifest(docs.orderBy(rand(7)), nShards = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(m1 === m2)
    assert(m1.keySet === Set(0L, 1L, 2L))
    assert(m1.values.map(_._1).sum === 40L)
    // one corrupted document moves exactly its shard's content digest
    val corrupted = docs.withColumn("text",
      when(col("doc_id") === 17L, lit("tampered")).otherwise(col("text")))
    val m3 = Curation.exportManifest(corrupted, nShards = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val moved = m1.keys.filter(s => m3(s) != m1(s)._3)
    assert(moved.size === 1, s"exactly one shard digest must move: $moved")
  }

  test("headMiddleTail: value-closed terciles, ties share a bucket") {
    import org.apache.spark.sql.functions._
    // 9 distinct scores → exact thirds
    val df = (1L to 9L).map(i => ("g", i, 10L - i)).toDF("grp", "id", "s")
    val b = Curation.headMiddleTail(df, "grp", "s")
      .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert((1L to 3L).forall(b(_) == "head"))     // scores 9,8,7
    assert((4L to 6L).forall(b(_) == "middle"))   // scores 6,5,4
    assert((7L to 9L).forall(b(_) == "tail"))     // scores 3,2,1
    // a tie mass straddling the cutoff lands in ONE bucket (value-closed):
    // scores 5,5,5,1 → c_head = 5 (first value with 3·cum ≥ 4), so all
    // three 5s are head; no row_number coin flip splits them
    val tied = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L), ("g", 4L, 1L))
      .toDF("grp", "id", "s")
    val tb = Curation.headMiddleTail(tied, "grp", "s")
      .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(Seq(1L, 2L, 3L).forall(tb(_) == "head"))
    assert(tb(4L) === "tail")
    // groups bucket independently
    val two = ((1L to 6L).map(i => ("a", i, i)) ++ Seq(("b", 7L, 100L)))
      .toDF("grp", "id", "s")
    val t2 = Curation.headMiddleTail(two, "grp", "s")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(t2(("b", 7L)) === "head") // singleton group: its one value is head
    assert(t2(("a", 6L)) === "head")
    assert(t2(("a", 1L)) === "tail")
  }
}
