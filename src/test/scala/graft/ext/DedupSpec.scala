package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id as canonical") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val out = Dedup.exact(d).collect().map(r =>
      (r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L), (3L, 1L)))
  }

  test("minhash near-dups finds the high-jaccard pair only") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
    val distinct = (100 to 130).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> distinct)
    val pairs = Dedup.minhashNearDups(d, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("ngram jaccard: identical docs score 1.0, disjoint docs absent") {
    val t = "one two three four five six"
    val d = docs(1L -> t, 2L -> t, 3L -> "seven eight nine ten eleven")
    val rows = Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.5).collect()
    assert(rows.length === 1)
    assert((rows(0).getLong(0), rows(0).getLong(1)) === (1L, 2L))
    assert(rows(0).getDouble(2) === 1.0)
  }

  test("shared-postings faces ≡ doc-input faces (one tokenization, same pairs)") {
    // the eval queries shingle the corpus ONCE and feed both the exact
    // index and the sketch chain — pin that the postings-based faces
    // return row-identical results to the standalone ones
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
    val distinct = (100 to 130).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> distinct,
      4L -> base, 5L -> (base + " tail extra"))
    val sh = Dedup.shingles(d, 3).localCheckpoint(true)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(rows(Dedup.minhashNearDupsFromPostings(sh, 0.5)) ===
      rows(Dedup.minhashNearDups(d, 0.5)))
    assert(rows(Dedup.ngramJaccardFromPostings(sh, 0.5)) ===
      rows(Dedup.ngramJaccardPairs(d, 3, 0.5)))
    assert(rows(Dedup.fingerprintNearDups(d, 0.5, postings = Some(sh))) ===
      rows(Dedup.fingerprintNearDups(d, 0.5)))
    assert(rows(Dedup.fingerprintNearDups(d, 0.5)).nonEmpty)
  }

  test("minhash calibration: identical docs agree on all lanes at exact jaccard 1") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
    val d = docs(1L -> base, 2L -> base, 3L -> nearDup)
    val rows = Dedup.minhashEstCalibration(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // the identical pair (1,2): all 16 lanes equal, mean exact j4 = 10000
    val full = rows.filter(_._1 == graft.ext.Hashing.numHashes)
    assert(full.nonEmpty)
    assert(full.exists { case (_, n, mj) => n >= 1L && mj == 10000L })
    // every bucket's mean sits on the 0..10000 lattice
    assert(rows.forall { case (l, n, mj) =>
      l >= 0 && l <= graft.ext.Hashing.numHashes && n > 0 && mj >= 0 && mj <= 10000 })
  }

  test("sketch-only dups: identical pair at 16 lanes, distinct doc absent; minLanes=0 keeps all candidates") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val distinct = (100 to 130).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> distinct)
    val all = Dedup.minhashSketchOnlyDups(d, minLanes = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val strict = Dedup.minhashSketchOnlyDups(d, minLanes = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(strict.toSet === Set((1L, 2L, 16L)))
    // strict is a filter of the candidate set — no pair appears in
    // strict that minLanes=0 lacks
    assert(strict.toSet.subsetOf(all.toSet))
  }

  test("containment estimate: identical pair at 1.0 both ways; subset direction dominates") {
    val base = (1 to 28).map(i => s"w$i").mkString(" ")
    val sup = (1 to 34).map(i => s"w$i").mkString(" ")
    val distinct = (100 to 130).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> sup, 4L -> distinct)
    val est = Dedup.containmentEstPairs(d, threshold = 0.0).collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(2)).toMap
    // identical docs: all 16 lanes agree, c = 16·2s/(32·s) = 1.0 both ways
    assert(est((2L, 1L)) === 1.0 && est((1L, 2L)) === 1.0)
    // subset pair: c(base→sup) strictly dominates c(sup→base) — the
    // asymmetric readout symmetric Jaccard can't give
    assert(est((3L, 1L)) > est((1L, 3L)),
      s"directionality lost: ${est((3L, 1L))} vs ${est((1L, 3L))}")
    // the unrelated doc never bands with anything
    assert(!est.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // estimates stay inside the containment range (clamped: sampling
    // error on k_eq/k cannot push past 1.0)
    assert(est.values.forall(v => v >= 0.0 && v <= 1.0), est)
  }

  test("sketch-only clusters: transitive family collapses, singleton labels itself") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val distinct = (100 to 130).map(i => s"v$i").mkString(" ")
    // 1-2-4 are byte-identical (16/16 lanes pairwise); 3 is unrelated
    val d = docs(1L -> base, 2L -> base, 3L -> distinct, 4L -> base)
    val r = Dedup.sketchOnlyClusters(d, minLanes = 13).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 3L -> 3L))
  }

  test("calibrated lane cutoff: suffix rule over the lattice table, numHashes fallback (VERDICT r13 #2)") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
    val distinct = (100 to 130).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> distinct, 4L -> base)
    val cut = Dedup.calibratedLaneCutoff(d, sampleMod = 1)
    // independent re-application of the documented rule on the same
    // lattice table: smallest lane level whose suffix keeps the running
    // min of mean_j4 at/above 5000
    val rows = Dedup.minhashEstCalibration(d)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).sortBy(-_._1)
    var sfx = Long.MaxValue
    var expect = 16
    rows.foreach { case (l, m) =>
      sfx = math.min(sfx, m)
      if (sfx >= 5000L) expect = l.toInt
    }
    assert(cut === expect)
    // the tripwire contract (VERDICT r13 #2): at and above the derived
    // cutoff, mean exact Jaccard never drops below the 0.5 threshold —
    // the property whose silent violation the hardcoded 13 risked
    assert(rows.filter(_._1 >= cut).forall(_._2 >= 5000L),
      s"cutoff $cut admits a level with mean exact J < 0.5: ${rows.toSeq}")
    // the near-dup corpus has real signal: some level qualifies
    assert(rows.nonEmpty && cut <= 16)
    // no banded candidates at all -> fall back to exact-signature-only
    val lonely = docs(1L -> base, 2L -> distinct)
    assert(Dedup.calibratedLaneCutoff(lonely, sampleMod = 1) === 16)
  }

  test("simhash: identical docs at hamming 0; fingerprint is stable") {
    val t = "alpha beta gamma delta epsilon zeta"
    val d = docs(1L -> t, 2L -> t)
    val rows = Dedup.simhashNearDups(d, maxDist = 3).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === Set((1L, 2L, 0L)))
    val fps = d.select(Dedup.simhash(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) === fps(1))
    assert(fps(0) >= 0L && fps(0) < (1L << 32))
  }

  test("fingerprint near-dups: extreme-gram buckets find the dup, skip the distinct") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val d = docs(1L -> base, 2L -> base, 3L -> "completely different content here with nothing shared at all")
    val pairs = Dedup.fingerprintNearDups(d, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs === Set((1L, 2L, 1.0)))
  }

  test("lsh candidates never pair a doc with itself and are a<b ordered") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "a b c d f")
    val cands = Dedup.lshCandidates(Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.shingles(d)))).collect()
    cands.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("repeated spans: shared substring yields one maximal span per doc, unique text none") {
    // docs 1 and 2 share a 30-char block at different offsets; doc 3 is
    // all-unique. k=10: every 10-gram inside the block repeats, nothing
    // else does — one island per doc spanning exactly the block.
    val block = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123" // 30 chars
    val d = docs(
      1L -> s"xxxx${block}yyyy",
      2L -> s"zzzzzzzz${block}wwww",
      3L -> "abcdefghij-unique-tail-qrstuv")
    val spans = Dedup.repeatedSpans(d, k = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(spans.size === 2)
    // doc 1: block at 1-based pos 5..34 → grams at 5..25, span 5..34
    assert(spans(1L) === ((5L, 34L, 30L, 21L)))
    // doc 2: block at pos 9..38 → grams at 9..29, span 9..38
    assert(spans(2L) === ((9L, 38L, 30L, 21L)))
  }

  test("bloom novelty gate: no false negatives, bounded false-positive drops") {
    import spark.implicits._
    val known = (0L until 500L).map(i => (i, s"known document number $i"))
      .toDF("doc_id", "text")
    val mixed = ((0L until 500L).map(i => (i, s"known document number $i")) ++
      (1000L until 2000L).map(i => (i, s"fresh document number $i")))
      .toDF("doc_id", "text")
    val novel = Dedup.novelAgainstApprox(mixed, known, expectedItems = 1000L)
      .as[Long].collect().toSet
    // every known doc is caught — the filter has no false negatives
    assert((0L until 500L).forall(i => !novel.contains(i)))
    // novel docs survive up to the fpp: ≥ 97% at fpp=1% is a safe margin
    val survived = (1000L until 2000L).count(novel.contains)
    assert(survived >= 970, s"only $survived/1000 novel docs survived")
    // agrees with the exact gate on everything the exact gate returns
    val exact = Dedup.novelAgainst(mixed, known).as[Long].collect().toSet
    assert(novel.subsetOf(exact))
  }

  test("bloom sizing raises the session clamp confs (no silent saturation)") {
    val items = 8L * 1000 * 1000 // above Spark's default 4M item clamp
    val bits = graft.functions.BloomOps.optimalNumBits(items, 0.3)
    graft.functions.BloomOps.bloomAgg(col("h"), items, bits) // constructing raises confs
    assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong >= items)
    assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong >= bits)
  }

  test("bloom novelty gate: empty known set classifies everything novel, nulls drop") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Dedup.novelAgainstApprox(docs, empty).as[Long].collect()
    assert(out.sorted.sameElements(Array(1L)))
  }

  test("edit-distance pairs: substitutions, deletions, and the d boundary") {
    val rows = Seq(
      (1L, "abcdef"),    // base
      (2L, "abXdef"),    // substitution at pos 3 → dist 1 from base
      (3L, "abdef"),     // deletion of c → dist 1 from base AND from 2
      (4L, "zzzzzz"),    // unrelated — no pairs
      (5L, "abcdefgh")   // dist 2 from base — found only at maxDist 2
    ).toDF("id", "s")
    def pairs(d: Int) = Dedup.editDistancePairs(rows, d, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d1 = pairs(1)
    assert(d1 === Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L), d1)
    val d2 = pairs(2)
    assert(d2((1L, 5L)) === 2L, s"pigeonhole must find the 2-edit pair: $d2")
    assert(!d2.contains((2L, 5L)), "ed(abXdef, abcdefgh) = 3 — out of range")
    assert(!d2.exists(_._1._1 == 4L) && !d2.exists(_._1._2 == 4L))
    // edit in the FIRST segment: the shared segment is the second half
    val tail = Seq((1L, "Xbcdef"), (2L, "abcdef")).toDF("id", "s")
    assert(Dedup.editDistancePairs(tail, 1, "id", "s").count() === 1L)
  }

  test("normalized exact dedup: reformatted variants collapse, scripts survive") {
    val d = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),      // case/punct/whitespace variant of 1
      (3L, "hello worlds"),       // genuinely different
      (4L, "你好, 世界!"),         // CJK with latin punctuation
      (5L, "你好 世界"),           // must collapse with 4, NOT with others
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Dedup.normalizedExact(d).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 2L, 3L -> 1L, 4L -> 2L, 6L -> 1L))
  }

  test("edit-distance pairs: hot shared prefix — salted run is pair-identical") {
    // the documented hazard corpus: a constant "Customer#" prefix makes
    // every string share low-entropy segments (hot blocks). Salting must
    // change PLACEMENT only: the pair set is exactly the unsalted one.
    val rows = (0 until 60).map(i => (i.toLong, f"Customer#${i / 10}%04d"))
      .toDF("id", "s")
    def pairSet(salt: Int) =
      Dedup.editDistancePairs(rows, 1, "id", "s", saltFactor = salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = pairSet(1)
    assert(plain.nonEmpty, "fixture must produce distance-1 pairs")
    assert(pairSet(8) === plain)
  }

  test("semanticDedup witnessCap: bounded witnesses, conservative keeps") {
    // k = 1: one cluster of 4. Uncapped, only 3 drops (witness 2). With
    // witnessCap = 2 the witness set {1, 2} still contains 3's witness →
    // same result; with witnessCap = 1 the only witness is 1, so 3 is
    // conservatively KEPT — the cap can under-drop, never over-drop.
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.99f, 0.01f, 0.0f)),  // twin of 2 only
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)))    // nobody's twin
      .toDF("vec_id", "embedding")
    def keeps(cap: Int) =
      Dedup.semanticDedup(e, k = 1, iters = 2, threshold = 0.9,
        witnessCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(keeps(0) === Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
    assert(keeps(2) === Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
    // cap = 1: only doc 1 witnesses; 3's witness (2) is outside → kept
    assert(keeps(1) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // a cap at least the cluster size is exactly the uncapped result
    assert(keeps(10) === keeps(0))
  }

  test("span excision: first instance survives, later ones cut, clean docs intact") {
    val passage = "0123456789ABCDEFGHIJKLMNOPQRS" // 29 chars — 10 repeated 20-grams
    // the shared MAXIMAL span is " <passage> " (31 chars): the
    // space-bracketed grams repeat across all three carriers, so the
    // islands extend one char each side and carry identical content
    val docs = Seq(
      (1L, s"alpha $passage omega"),   // first instance (smallest doc_id) — kept
      (2L, s"start $passage end"),     // cross-doc second instance — excised
      (3L, "totally unique content that repeats nothing at all here"),
      (4L, s"zz $passage zz tail")     // third instance — excised too
    ).toDF("doc_id", "text")
    val out = Dedup.exciseSpans(docs, k = 20).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.size === 4)
    // doc 1 holds the canonical instance: byte-identical, zero drops
    assert(out(1L) === ((s"alpha $passage omega", 0L, 0L)))
    // doc 3 has no repeats at all
    assert(out(3L)._2 === 0L && out(3L)._3 === 0L)
    // docs 2 and 4 each lost exactly the 31-char " passage " span
    assert(out(2L) === (("startend", 1L, 31L)), out(2L))
    assert(out(4L) === (("zzzz tail", 1L, 31L)), out(4L))
  }

  test("span excision: char-overlapping spans excise their union, counted once") {
    // ADVICE r9: two islands whose gram positions sit 2 apart overlap by
    // up to k-1 chars. S's first and last 20-grams repeat (docs 1 and 2
    // are exactly those grams), the middle one is unique to doc 9 — so
    // doc 9 carries two one-gram islands with spans [3,22] and [5,24]:
    // 18 chars of char-space overlap. Both instances lose to the smaller
    // doc ids and are dropped; the excised chars must count ONCE (union
    // = 22 chars), not per span extent (40).
    val s22 = "0123456789abcdefghijkl"
    val docs = Seq(
      (1L, s22.substring(0, 20)),  // S[0..19] — keeper of span 1's content
      (2L, s22.substring(2)),      // S[2..21] — keeper of span 2's content
      (9L, s"aa${s22}bb")
    ).toDF("doc_id", "text")
    val out = Dedup.exciseSpans(docs, k = 20).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) === ((s22.substring(0, 20), 0L, 0L)))
    assert(out(2L) === ((s22.substring(2), 0L, 0L)))
    assert(out(9L) === (("aabb", 2L, 22L)),
      s"union of overlapping spans must count once: ${out(9L)}")
  }

  test("span excision: hot digest is aggregated, not windowed (bounded task skew)") {
    // VERDICT r9 #3: a corpus-wide boilerplate span repeated across N
    // docs makes its content digest one hot key. The keep-first choice
    // must be a map-side-combinable aggregate — a window partitioned by
    // the digest would funnel all N instances into one task.
    // n exact copies: one span digest (the whole text) with n instances —
    // the hottest possible key
    val passage = "alpha 0123456789ABCDEFGHIJKLMNOPQRS omega"
    val n = 5000
    val docs = (1 to n).map(i => (i.toLong, passage)).toDF("doc_id", "text")
    val df = Dedup.exciseSpans(docs, k = 20)
    // plan: every Window partitions by the doc id (the islands windows),
    // NEVER by the span digest
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "islands windows expected")
    wins.foreach { w =>
      assert(w.partitionSpec.exists(_.toString.contains("doc_id")) &&
        !w.partitionSpec.exists(_.toString.contains("dg")),
        s"window keyed by the hot digest: ${w.partitionSpec}")
    }
    // correctness at the hot key: doc 1 keeps the canonical instance,
    // every other doc is a full duplicate and excises entirely
    val out = df.filter(col("doc_id").isin(1L, 2L, n.toLong))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((passage, 0L, 0L)))
    assert(out(2L) === (("", 1L, passage.length.toLong)), s"got ${out(2L)}")
    assert(out(n.toLong) === (("", 1L, passage.length.toLong)))
    assert(df.filter(col("n_dropped_spans") === 0L).count() === 1L)
  }

  test("cross-corpus spans: mark against the frozen corpus only, excise ALL instances") {
    val block = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123" // 30 chars — in the frozen corpus
    val twice = "qrstuvwxyz-0987654321-QWERTY"   // repeats WITHIN train only
    val ref = docs(100L -> s"frozen head ${block} frozen tail")
    val train = docs(
      1L -> s"xxxx${block}yyyy",
      2L -> s"zz${block}ww and also ${twice}",
      3L -> s"pp${twice}qq",
      4L -> "entirely novel text matching nothing anywhere at all")
    val rg = Dedup.spanGrams(ref, k = 10)
    val spans = Dedup.crossRepeatedSpans(train, rg, k = 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // only the frozen-corpus block marks; the within-train-only repeat
    // (the repeatedSpans face's job) must NOT
    assert(spans.keySet === Set(1L, 2L))
    assert(spans(1L) === ((5L, 34L, 30L, 21L))) // block at 1-based 5..34
    assert(spans(2L) === ((3L, 32L, 30L, 21L))) // block at 3..32
    // excision drops EVERY instance — the canonical copy lives in the
    // reference corpus, so there is no keep-first survivor here
    val out = Dedup.exciseCrossSpans(train, rg, k = 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("xxxxyyyy", 1L, 30L)), out(1L))
    assert(out(2L) === ((s"zzww and also ${twice}", 1L, 30L)), out(2L))
    assert(out(3L) === ((s"pp${twice}qq", 0L, 0L)), out(3L))
    assert(out(4L)._2 === 0L)
  }

  test("span excision: a full-document duplicate collapses to empty text") {
    val t1 = "alpha 0123456789ABCDEFGHIJKLMNOPQRS omega"
    val docs = Seq((1L, t1), (5L, t1)).toDF("doc_id", "text")
    val out = Dedup.exciseSpans(docs, k = 20).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) === ((t1, 0L, 0L)))
    assert(out(5L) === (("", 1L, t1.length.toLong)),
      s"exact copy must excise entirely: ${out(5L)}")
  }

  test("paragraph dedup: keep-first corpus-wide, ordered reassembly") {
    val d = docs(
      1L -> "intro\nboiler\nbody one",
      2L -> "boiler\nbody two\nboiler",
      3L -> "boiler",            // every paragraph seen → empties out
      4L -> "intro\nintro")      // in-document repeat also dedups
    val out = Dedup.paragraphDedup(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1 is first everywhere: byte-identical
    assert(out(1L) === (("intro\nboiler\nbody one", 3L, 0L)))
    // doc 2 loses both boiler instances (doc 1 pos 1 owns the digest)
    assert(out(2L) === (("body two", 3L, 2L)))
    assert(out(3L) === (("", 1L, 1L)))
    assert(out(4L) === (("", 2L, 2L)))
    assert(out.size === 4)
  }

  test("paragraph dedup: separator-free corpus degrades to exact doc dedup") {
    val d = docs(1L -> "same text", 2L -> "same text", 3L -> "other")
    val out = Dedup.paragraphDedup(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "same text", 2L -> "", 3L -> "other"))
  }

  test("best-of-cluster picks the member with the highest quality score") {
    // chain 10-11-12 clusters together (same fixture as duplicateClusters);
    // 99 is a singleton and picks itself
    val base = (0 until 30).map(i => s"word$i").mkString(" ")
    val d = docs(
      10L -> base,
      11L -> (base + " extra"),
      12L -> (base + " extra more"),
      99L -> "totally different words with no overlap at all whatsoever here")
    val quality = d.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expectBest = Seq(10L, 11L, 12L).maxBy(id => (quality(id), -id))
    val out = Dedup.bestOfClusters(d, threshold = 0.3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out(10L) === ((expectBest, quality(expectBest), 3L)))
    assert(out(99L) === ((99L, quality(99L), 1L)))
    assert(out.size === 2)
  }

  test("semanticDedup drops within-cluster cosine twins, keeps smallest id") {
    // k = 1 pins the partition (all vectors share the cluster) so the
    // test isolates the pair/keep logic; which twins a k>1 fit can see
    // is the algorithm's recall knob, exercised by the oracle query
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),   // near-copy of 1
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.01f, 0.99f, 0.0f)),   // near-copy of 3
      (5L, Array(0.0f, 0.0f, 0.98f, -0.2f)))   // near 3 and 4
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(e, k = 1, iters = 2, threshold = 0.9)
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(4))).toMap
    assert(got(1L) === ((None, 1L)))
    assert(got(2L) === ((Some(1L), 0L)))
    assert(got(3L) === ((None, 1L)))
    assert(got(4L) === ((Some(3L), 0L)))
    assert(got(5L)._1 === Some(3L)) // smallest witness, even though 4 also matches
    assert(got(5L)._2 === 0L)
  }

  test("dedupImpact counts removable duplicates and their chars per stratum") {
    val d = Seq(
      (1L, "web", "same text"), (2L, "web", "same text"),
      (3L, "web", "other"), (4L, "code", "same text"),
      (5L, "code", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val got = Dedup.dedupImpact(d, col("source")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    // web: 3 docs; doc 2 duplicates doc 1 (9 chars); 9+9+5=23 total
    assert(got("web") === ((3L, 1L, 23L, 9L, 0.3333)))
    // code: doc 4 duplicates doc 1 (cross-stratum keeper!); null-text doc
    // counts in n_docs but never as a dup
    assert(got("code") === ((2L, 1L, 9L, 9L, 0.5)))
  }

  test("dupExposure: shared-shingle share on the q4 lattice; short docs 0") {
    // d0's single 5-gram also lives in d1 (df 2) -> exposure 1.0; d1 has
    // one shared of two -> 0.5; d2 all unique -> 0.0; d3 too short -> 0/0/0
    val docs = Seq(
      (0L, "v w x y z"), (1L, "v w x y z q"),
      (2L, "q r s t u"), (3L, "hi")).toDF("doc_id", "text")
    val got = Dedup.dupExposure(docs, n = 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) === ((1L, 1L, 1.0)))
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((1L, 0L, 0.0)))
    assert(got(3L) === ((0L, 0L, 0.0)))
  }
}
