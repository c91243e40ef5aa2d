package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, TextAnalysis}
import graft.model.{Scd2Config, Schemas}
import graft.ops.AsofJoin
import graft.scd2.Historizer

/** Degenerate-input behavior: empty batches, empty/short documents,
  * empty join sides. These are the inputs a 100 TB pipeline hits daily
  * (empty partitions, blank documents) — they must produce empty/neutral
  * results, never exceptions. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val now = Timestamp.valueOf("2024-06-01 00:00:00")

  test("SCD2 apply with an empty batch leaves the target unchanged") {
    val conf = Scd2Config(loadKey = 1L)
    val batch = Seq(("IST", "62.0", "29.4",
      Timestamp.valueOf("2024-03-01 09:00:00"), "DEV01", 1L))
      .toDF("timezone", "humidity", "temperature", "timestamp", "deviceid", "load_key")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.scd2Target)
    val tgt = Historizer.applyScd2(batch, empty, conf, now)
    // next batch id carries no rows at all
    val emptyBatch = batch.filter(lit(false)).withColumn("load_key", lit(2L))
    val tgt2 = Historizer.applyScd2(emptyBatch, tgt, conf.copy(loadKey = 2L), now)
    assert(tgt2.collect().toSet === tgt.collect().toSet)
  }

  test("dedup operators are no-ops on blank and sub-shingle documents") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one two"), (4L, "one two"))
      .toDF("doc_id", "text")
    // too short for 3-gram shingles → no near-dup signal, no crash
    assert(Dedup.minhashNearDups(docs).count() === 0)
    assert(Dedup.ngramJaccardPairs(docs).count() === 0)
    // simhash of an empty token list is the all-zero fingerprint (votes
    // all non-positive), pairing blanks together at hamming 0
    val fps = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === 0L && fps(2L) === 0L)
    assert(fps(3L) === fps(4L))
    // exact dedup still groups blanks by their (distinct) raw text
    assert(Dedup.exact(docs).count() === 3)
  }

  test("text analysis handles empty strings") {
    val one = Seq("").toDF("text")
    val r = one.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeTokenCount(col("text")).as("bpe"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.fingerprint(col("text")).as("fp")).collect()(0)
    assert(r.getLong(0) === 0L && r.getLong(1) === 0L)
    assert(r.getString(2) === "und")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(!r.isNullAt(4)) // whole-text hash fallback
  }

  test("curation operators on empty and degenerate corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.chunkTokens(empty).count() === 0)
    assert(Curation.tfidfTopTerms(empty).count() === 0)
    assert(Curation.stratifiedSample(empty,
      TextAnalysis.langId(col("text")), Map("en" -> 50), 20).count() === 0)
    assert(Curation.samplePerGroup(empty,
      TextAnalysis.langId(col("text")), 3).count() === 0)
    assert(Dedup.duplicateClusters(empty).count() === 0)

    // blank docs: no chunks, no terms; redaction passes blanks through
    val blanks = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(Curation.chunkTokens(blanks).count() === 0)
    assert(Curation.tfidfTopTerms(blanks).count() === 0)
    val red = blanks.select(Curation.redactPii(col("text"))).collect().map(_.getString(0))
    assert(red.toSet === Set("", "   "))
    // a corpus with no near-dup pairs: every doc is its own cluster
    val solo = Seq((1L, "one two three four"), (2L, "five six seven eight"))
      .toDF("doc_id", "text")
    val clusters = Dedup.duplicateClusters(solo).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 2L))
  }

  test("round-4 operators on empty and degenerate corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val some = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // decontamination: empty eval set flags nothing; null text = no grams
    val ds = graft.ext.Decontamination.overlapStats(some, empty)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ds === Map(1L -> 0L, 2L -> 0L))
    assert(graft.ext.Decontamination.clean(some, empty).count() === 2)
    // repetition stats: null text reports null word count, zero fractions
    val rep = TextAnalysis.repetitionStats(some).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rep(2L).isNullAt(1) && rep(2L).getDouble(7) === 0.0)
    // packing / resampling / top-quality on empty input yield empty output
    assert(Curation.packSequences(empty).count() === 0)
    assert(Curation.resampleToMix(empty, col("doc_id").cast("string"),
      Map("x" -> 1)).count() === 0)
    assert(Curation.topQualityPerGroup(empty,
      TextAnalysis.langId(col("text")), 500000L).count() === 0)
    assert(Curation.boilerplateStats(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source"))
      .count() === 0)
    // corpus report over an empty corpus: zero rows (grouped-aggregate
    // semantics — ROLLUP emits no grand total without input, same in SQL)
    assert(Curation.corpusReport(
      Seq.empty[(Long, String, String, String)]
        .toDF("doc_id", "text", "source", "lang")).count() === 0)
  }

  test("round-10 operators on empty and degenerate corpora") {
    import graft.ext.Classifier
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    val someDocs = Seq((1L, "a", "x y"), (2L, "b", "y z")).toDF("doc_id", "source", "text")

    // empty training set → empty profiles → every prediction null
    val emptyProfiles = Classifier.classProfiles(empty, "source")
    assert(emptyProfiles.count() === 0)
    val preds = Classifier.predict(someDocs, emptyProfiles).collect()
    assert(preds.length === 2 && preds.forall(_.isNullAt(1)))

    // empty scoring set → empty verdicts, no exception
    assert(Classifier.predict(empty, Classifier.classProfiles(someDocs, "source"))
      .count() === 0)

    // merging with an empty state is the monoid identity
    val st = Classifier.trainState(someDocs, "source")
    val merged = Classifier.mergeStates(st, Classifier.trainState(empty, "source"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(merged === st.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)

    // temperature schedule: empty corpus → empty schedule; single group
    // takes the whole ppm mass
    assert(Curation.temperatureSchedule(empty, "source").count() === 0)
    val solo = Curation.temperatureSchedule(
      Seq((1L, "only"), (2L, "only")).toDF("doc_id", "source"), "source")
      .collect().head
    assert(solo.getLong(3) === 1000000L && solo.getLong(4) === 10000L)
  }

  test("round-11 operators on empty and degenerate inputs") {
    import graft.ext.{DataQuality, Eval, Graph}
    val noNodes = Seq.empty[Long].toDF("doc_id")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("doc_id")

    // graph ops: empty edge set → every node at base/zero/unlabeled;
    // empty node set → empty result, no exception
    val pr = Graph.pageRank(nodes, noEdges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr === Map(1L -> 150000L, 2L -> 150000L))
    assert(Graph.pageRank(noNodes, noEdges, iters = 1).count() === 0)
    val h = Graph.hits(nodes, noEdges, iters = 1).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(h === Set((0L, 0L)))
    val lp = Graph.labelPropagation(nodes, noEdges,
      Seq.empty[(Long, String)].toDF("id", "label"), iters = 1).collect()
    assert(lp.forall(r => r.isNullAt(1) && r.getString(2) == "none"))

    // spearman on an empty frame: one row of zeros, rho guard 0.0
    val sp = Eval.spearman(Seq.empty[(Long, Long, Long)]
      .toDF("id", "a", "b"), "id", "a", "b").collect().head
    assert((sp.getLong(0), sp.getLong(1), sp.getDouble(2)) === ((0L, 0L, 0.0)))

    // mixEpochs on an empty corpus → empty plan; profileDrift where a
    // column exists on both sides of an empty slice pair behaves
    assert(Curation.mixEpochs(Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "src", "n_chars"), col("src"), identity, 100L)
      .count() === 0)
    val dEmpty = Seq.empty[(Long, String)].toDF("k", "flag")
    val drift = DataQuality.profileDrift(dEmpty, dEmpty, Seq("k")).collect()
    assert(drift.length === 5 && drift.forall(!_.getBoolean(4)))

    // sentence ops: blank and terminator-free docs
    val sdocs = Seq((1L, ""), (2L, "   "), (3L, "abc")).toDF("doc_id", "text")
    val ss = TextAnalysis.sentenceStats(sdocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ss(1L) === 0L && ss(3L) === 1L)
    assert(TextAnalysis.chunkBySentences(sdocs, budget = 10)
      .filter(col("doc_id") === 1L).count() === 0)
  }

  test("r12 selection ops: null text, empty corpus, empty model") {
    import graft.ext.Similarity
    val nd = Seq((1L, null.asInstanceOf[String], "en", "s0", 0L),
        (2L, "slow words here", "en", "s0", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // blocklist: null text = blank page, never size()=-1 artifacts
    val bl = TextAnalysis.blocklistStats(nd, Seq("slow")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(bl(1L) === ((0L, 0L)) && bl(2L) === ((3L, 1L)))
    // char HHI: null text scores 0 like empty
    val hh = nd.select(col("doc_id"),
        TextAnalysis.charConcentration(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hh(1L) === 0L)
    // dsir: null-text doc still lands in the dense output with zeros
    val dw = Curation.dsirWeights(nd, col("lang") === "en", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dw(1L) === 0L && dw(2L) === 3L)
    // empty-model frozen scoring: no crash, smoothing-only scores
    val emptyModel = nd.filter(lit(false))
    val fs = Curation.dsirScore(emptyModel, col("lang") === "en", nd,
      buckets = 64).collect()
    assert(fs.length === 2)
    // k-center on an empty corpus: empty assignment, not a crash
    val emptyEmb = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
      .filter(lit(false))
    assert(Similarity.kCenterGreedy(emptyEmb, k = 3).count() === 0L)
    // shard assignment + k-anonymity on empty inputs
    assert(Curation.shardAssign(nd.filter(lit(false)), 4).count() === 0L)
    assert(Curation.kAnonymity(nd.filter(lit(false)),
      Seq("lang", "source"), 5).count() === 0L)
  }

  test("as-of join with an empty right side keeps all left rows with nulls") {
    val left = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), "r1"))
      .toDF("k", "ts", "reading")
    val right = left.filter(lit(false))
      .select(col("k"), col("ts"), col("reading").as("cfg"))
    val out = AsofJoin.asofLeft(left, right, Seq("k"), "ts", Seq("cfg")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("cfg") === null)
  }
}
