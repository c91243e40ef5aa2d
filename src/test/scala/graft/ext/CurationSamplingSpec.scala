package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-10 curation additions: systematic weighted sampling,
  * preference pairs, group-aware split, nDCG evaluation. */
class CurationSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSystematicSample draws exactly k picks proportional to weight") {
    // k = 23, NOT 20: with 20 the step (2180/20 = 109) would equal the
    // weight period of this fixture (10 rows = 109 mass) and systematic
    // sampling aliases — every pointer lands on the same phase. A step
    // coprime to the period (94) samples all phases; real corpora don't
    // have exact weight periodicity, but samplers of periodic data
    // should jitter k (documented behavior, not a bug).
    val docs = (1L to 200L).map(i => (i, if (i % 10 == 0) 100L else 1L))
      .toDF("doc_id", "n_chars")
    val s = Curation.weightedSystematicSample(docs, "n_chars", k = 23)
    val picks = s.agg(sum(col("n_picks"))).as[Long].head()
    assert(picks === 23)
    val heavy = s.filter(col("doc_id") % 10 === 0).count()
    assert(heavy >= 15, s"expected most picks on heavy rows, got $heavy")
  }

  test("weightedSystematicSample is independent of bucketing") {
    val docs = (1L to 500L).map(i => (i * 7 % 1000, i % 13 + 1))
      .toDF("doc_id", "n_chars").distinct()
    val a = Curation.weightedSystematicSample(docs, "n_chars", k = 37, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val b = Curation.weightedSystematicSample(docs, "n_chars", k = 37, buckets = 113)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(a === b)
  }

  test("weightedSystematicSample handles k > total weight and empty input") {
    val docs = Seq((1L, 2L), (2L, 3L)).toDF("doc_id", "n_chars")
    val s = Curation.weightedSystematicSample(docs, "n_chars", k = 50)
    // step clamps to 1: every weight unit below k gets a pointer
    assert(s.agg(sum(col("n_picks"))).as[Long].head() === 5)
    val empty = docs.filter(lit(false))
    assert(Curation.weightedSystematicSample(empty, "n_chars", k = 5).count() === 0)
  }

  test("preferencePairs picks best-vs-worst per stratum with deterministic ties") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "a", "en"),
      (2L, "zz@@!!##", "a", "en"),
      (3L, "the quick brown fox jumps over the lazy dog again and again", "a", "en"),
      (4L, "only one doc here", "b", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val p = Curation.preferencePairs(docs).collect()
    assert(p.length === 1) // stratum b has 1 doc; stratum a emits a pair
    val r = p.head
    assert(r.getAs[Long]("chosen_id") === 1L) // tie with 3 → smaller id
    assert(r.getAs[Long]("rejected_id") === 2L)
    assert(r.getAs[Double]("margin") > 0)
  }

  test("hashSplitByGroup keeps every group in one split") {
    val docs = (1L to 300L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")
    val s = Curation.hashSplitByGroup(docs, "source")
    val perGroup = s.groupBy(col("source"))
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perGroup.forall(_.getAs[Long]("n") === 1L))
  }

  test("ndcgAtK: perfect ranking scores 1.0, reversed scores less") {
    val rels = Seq((0L, 10L, 3L), (0L, 11L, 2L), (0L, 12L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val perfect = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val reversed = Seq((0L, 12L, 1L), (0L, 11L, 2L), (0L, 10L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val n1 = Curation.ndcgAtK(perfect, rels, k = 3).collect().head
    assert(n1.getAs[Double]("ndcg") === 1.0)
    val n2 = Curation.ndcgAtK(reversed, rels, k = 3).collect().head
    assert(n2.getAs[Double]("ndcg") < 1.0 && n2.getAs[Double]("ndcg") > 0.5)
  }

  test("ndcgAtK: query with no relevant docs reports 0") {
    val rels = Seq((1L, 10L, 2L)).toDF("query_id", "doc_id", "rel")
    val ranked = Seq((0L, 10L, 1L)).toDF("query_id", "doc_id", "rnk")
    val out = Curation.ndcgAtK(ranked, rels, k = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ndcg")).toMap
    assert(out(0L) === 0.0) // ranked but nothing relevant
    assert(out(1L) === 0.0) // relevant but never ranked → dcg 0
  }

  test("cluster-aware split keeps near-duplicates in one split") {
    val text = "the quick brown fox jumps over the lazy dog every single day"
    val docs = Seq(
      (1L, text), (2L, text + " extra"), // near-dups → one cluster
      (3L, "completely different content about spark query engines here"))
      .toDF("doc_id", "text")
    val c = Dedup.duplicateClusters(docs)
    val s = Curation.hashSplitByGroup(c, "cluster_id", salt = "csplit")
    val perCluster = s.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perCluster.forall(_.getAs[Long]("n") === 1L))
    // the near-dup pair landed in the same cluster, hence same split
    val splits = s.filter(col("doc_id") <= 2)
      .select(col("split")).distinct().count()
    assert(splits === 1)
  }

  test("containmentPairs flags a subsumed document that Jaccard misses") {
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val short = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, "completely different words entirely"))
      .toDF("doc_id", "text")
    val c = Dedup.containmentPairs(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(c.contains((2L, 1L))) // short ⊂ long
    assert(!c.contains((1L, 2L))) // long not contained in short
    // symmetric Jaccard on the same pair is far below a near-dup bar
    val j = Dedup.ngramJaccardPairs(docs, threshold = 0.0)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .collect()
    assert(j.isEmpty || j.head.getAs[Double]("jaccard") < 0.3)
  }

  test("fillByBudget keeps exactly the greedy quality-prefix until the unit budget") {
    val rows = Seq(
      (1L, "a", 60L, "the of and to in is it was for on as are this that by"),
      (2L, "a", 60L, "zx qv jk wp mn bb cc dd ee ff gg hh ii jj kk"),
      (3L, "a", 60L, "the cat sat on the mat and then the dog came along too"),
      (4L, "a", 60L, "one two three four five six seven eight nine ten more"),
      (5L, "b", 90L, "the of and to in is good clean english text here now"),
      (6L, "b", 90L, "qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss ddd"))
    val d = rows.toDF("doc_id", "source", "n_chars", "text")
    val got = Curation.fillByBudget(d, col("source"), budget = 120L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // reference: per stratum, order by (q4 desc, id), keep while
    // cum-before < 120 — derived from the operator's own score column
    val q = d.select(col("source"), col("doc_id"), col("n_chars"),
        TextAnalysis.qualityScoreQ4(col("text")).as("q4")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = q.groupBy(_._1).toSeq.flatMap { case (s, xs) =>
      var cum = 0L
      xs.sortBy { case (_, id, _, q4) => (-q4, id) }.toSeq.flatMap {
        case (_, id, units, _) =>
          val keep = cum < 120L
          cum += units
          if (keep) Some((s, id)) else None
      }
    }.toSet
    assert(got === expect)
    // stratum a: 60-char docs → exactly 2 survive (cum-before 120 stops
    // the third); stratum b: 90-char docs → 2 survive (90 < 120)
    assert(got.count(_._1 == "a") === 2)
    assert(got.count(_._1 == "b") === 2)
  }

  test("calibrateQuality: pct = strictly-below fraction within the stratum, ties share") {
    val d = Seq(
      (1L, "a", "zz qq ww"),                               // low quality
      (2L, "a", "zz qq ww"),                               // tie with 1
      (3L, "a", "the of and to in is it for on as that"),  // high
      (4L, "b", "anything at all here"))                   // alone in b
      .toDF("doc_id", "source", "text")
    val got = Curation.calibrateQuality(d, col("source")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    // stratum a (n=3): docs 1,2 tie at the bottom → below=0 → pct 0;
    // doc 3 has 2 strictly below → floor(2e6/3)/1e6
    assert(got(1L) === (("a", 0.0)))
    assert(got(2L) === (("a", 0.0)))
    assert(got(3L) === (("a", 0.666666)))
    // singleton stratum: below=0 → pct 0
    assert(got(4L) === (("b", 0.0)))
    // sanity: the high-quality doc really scores above the tied pair
    val q = d.select(col("doc_id"),
        TextAnalysis.qualityScoreQ4(col("text")).as("q4")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q(3L) > q(1L))
    assert(q(1L) === q(2L))
  }

  test("mixEpochs: exact shares and floor-lattice epochs") {
    // stratum a: weight 1, 200 chars; b: weight 3, 100 chars; budget 1000
    val d = Seq((1L, "a", 120L), (2L, "a", 80L), (3L, "b", 100L))
      .toDF("doc_id", "src", "n_chars")
    val got = Curation.mixEpochs(d, col("src"),
        s => when(s === "a", 1L).otherwise(3L), budget = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    // a: target = ⌊1·1000/4⌋ = 250; epochs = ⌊1·1000·1e4/(4·200)⌋/1e4 = 1.25
    assert(got("a") === ((2L, 200L, 1L, 250L, 1.25)))
    // b: target = 750; epochs = ⌊3·1000·1e4/(4·100)⌋/1e4 = 7.5
    assert(got("b") === ((1L, 100L, 3L, 750L, 7.5)))
  }
}
