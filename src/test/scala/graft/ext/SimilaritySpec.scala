package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def embTable(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private val e1 = Seq(1f, 0f, 0f, 0f)
  private val e1b = Seq(0.9f, 0.1f, 0f, 0f) // close to e1
  private val e2 = Seq(0f, 1f, 0f, 0f)      // orthogonal

  test("brute-force top-k ranks the near vector first, excludes self") {
    val corpus = embTable(1L -> e1, 2L -> e1b, 3L -> e2)
    val queries = embTable(1L -> e1)
    val out = Similarity.bruteForceTopK(corpus, queries, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(t => (t._2, t._4)).toSeq === Seq((2L, 1L), (3L, 2L)))
    assert(out(0)._3 > 0.99 && out(1)._3 === 0.0)
    assert(!out.exists(_._2 == 1L)) // self excluded
  }

  test("cosine near-dup pairs: identical vectors at cos 1.0") {
    val t = embTable(1L -> e1, 2L -> e1.map(_ * 2f), 3L -> e2)
    val rows = Similarity.cosineNearDupPairs(t, threshold = 0.9).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      === Set((1L, 2L, 1.0)))
  }

  test("ann top-k results are a subset of brute-force candidates with exact cosines") {
    val e = graft.Tables.load(spark, sf(), "embeddings").limit(200).cache()
    val q = e.filter(col("vec_id") < 4)
    val ann = Similarity.annTopK(e, q, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bf = Similarity.bruteForceTopK(e, q, k = 200).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every ANN pair exists in the exhaustive ranking with the same cosine
    ann.foreach { case (k, cos) => assert(bf(k) === cos) }
    e.unpersist()
  }

  test("ivf top-k: exact cosines, recall vs brute force measured") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val q = e.filter(col("vec_id") < 8)
    val ivf = Similarity.ivfTopK(e, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bf = Similarity.bruteForceTopK(e, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bfAll = Similarity.bruteForceTopK(e, q, k = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every IVF result is a genuine neighbor with its exact cosine
    ivf.foreach { case (k0, cos) => assert(bfAll(k0) === cos) }
    // recall@5 against brute force is usable (probing 4 of 10 cells)
    val recall = bf.keySet.count(ivf.contains).toDouble / bf.size
    assert(recall >= 0.4, s"recall $recall")
    e.unpersist()
  }

  test("bucketed near-dup pairs ⊆ exact pairs with identical cosines; identical vectors always found") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val bucketed = Similarity.cosineNearDupPairsBucketed(e, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Similarity.cosineNearDupPairs(e, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(bucketed.nonEmpty)
    bucketed.foreach { case (k, cos) => assert(exact(k) === cos) }
    e.unpersist()
    // an identical pair shares every band bucket — recall 1 at cos 1.0
    val t = embTable(1L -> e1, 2L -> e1.map(_ * 2f), 3L -> e2)
    val ident = Similarity.cosineNearDupPairsBucketed(t, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ident === Set((1L, 2L, 1.0)))
  }

  test("zero-norm centroid: aggregate argmin agrees with the cos-DESC NaN-first rule") {
    // ADVICE r4: a zero-norm centroid makes every cosine against it NaN;
    // ORDER BY cos DESC ranks NaN FIRST (Spark windows AND DuckDB), so
    // the whole corpus must assign to the degenerate cell — and the
    // query probes it too, so IVF degrades to exact search over the one
    // cell and must equal brute force. Before the nanvl guard, the
    // corpus-side min(struct(-cos,…)) ranked NaN LAST: corpus and probes
    // disagreed on the cell and results silently vanished.
    val corpus = embTable(1L -> e1, 2L -> e1b, 3L -> e2)
    val queries = embTable(1L -> e1)
    val cents = Seq(
      (10L, Seq(0.0, 0.0, 0.0, 0.0)), // zero-norm: cos = NaN vs everything
      (11L, Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("cent_id", "ct")
      .withColumn("ct_norm", Similarity.norm(col("ct")))
    val got = Similarity.ivfTopKFrom(corpus, queries, k = 2, cents, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSet === brute.toSet)
    assert(got.nonEmpty)
  }

  test("sign bucket is deterministic and within 8 bits") {
    val t = embTable(1L -> e1, 2L -> e1, 3L -> e2)
    val b = t.select(Similarity.signBucket(
      Similarity.toDouble(col("embedding")))).collect().map(_.getLong(0))
    assert(b(0) === b(1))
    b.foreach(v => assert(v >= 0L && v < 256L))
  }

  test("sq8 search: high recall vs float cosine, identical vectors at cos 1.0") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val q = e.filter(col("vec_id") < 8)
    val sq8 = Similarity.sq8TopK(e, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(e, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 quantizes cosine finely (unlike 8-byte PQ codes): recall@5
    // against the exact float ranking should be high
    val recall = bf.count(sq8.contains).toDouble / bf.size
    assert(recall >= 0.7, s"recall $recall")
    e.unpersist()
    // scaled copies share codes exactly: cos 1.0, and self is excluded
    val t = embTable(1L -> e1, 2L -> e1.map(_ * 3f), 3L -> e2)
    val top = Similarity.sq8TopK(t, t.filter(col("vec_id") === 1L), k = 1)
      .collect()
    assert(top.length === 1)
    assert(top(0).getLong(1) === 2L && top(0).getDouble(2) === 1.0)
  }

  test("projected coarse-to-fine: exact cosines, high recall via the pool") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val two = Similarity.projectedTopK(e, q, k = 5, poolSize = 40).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bf = Similarity.bruteForceTopK(e, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every returned cosine is the EXACT full-dim value
    two.foreach { case (k2, c) =>
      assert(bf.get(k2).forall(_ === c) ||
        math.abs(c) <= 1.0, s"cos out of range for $k2")
    }
    val overlap = two.keySet.intersect(bf.keySet).size.toDouble / bf.size
    // a 40-candidate pool recovers a solid share of the true top-5 even
    // on the near-isotropic fixture (chance ≈ 40/500)
    assert(overlap >= 0.4, s"recall@5 through pool-40 = $overlap")
  }

  test("MMR diversifies: near-duplicate pool spreads across clusters") {
    // two tight clusters; the relevant cluster (near the query) has 3
    // near-identical members, the other is distinct but still relevant
    val t = embTable(
      0L -> Seq(1f, 0f, 0f, 0f),        // query
      1L -> Seq(0.99f, 0.1f, 0f, 0f),   // dup cluster
      2L -> Seq(0.99f, 0.11f, 0f, 0f),
      3L -> Seq(0.99f, 0.12f, 0f, 0f),
      4L -> Seq(0.6f, 0.8f, 0f, 0f))    // distinct direction
    val q = t.filter(col("vec_id") === 0L)
    val plain = Similarity.bruteForceTopK(t, q, k = 2).collect()
      .map(_.getLong(1)).toSet
    // pure relevance: both picks come from the duplicate cluster
    assert(plain.subsetOf(Set(1L, 2L, 3L)), s"plain $plain")
    // λ=0.3 weights redundancy enough to beat the dup cluster's ~0.99
    // relevance edge (at λ=0.5 the dup's 0.994 rel − 0.99995 sim still
    // nets above the distinct vector's 0.6 rel − 0.677 sim)
    val mmr = Similarity.mmrTopK(t, q, k = 2, poolSize = 4, lambda = 0.3)
      .collect().sortBy(_.getLong(1)).map(_.getLong(2))
    // MMR keeps the best duplicate, then jumps to the distinct vector
    assert(mmr.length === 2)
    assert(Set(1L, 2L, 3L).contains(mmr(0)), s"first pick ${mmr(0)}")
    assert(mmr(1) === 4L, s"second pick must diversify, got ${mmr(1)}")
  }

  test("MMR at λ=1 reduces to relevance ranking") {
    val t = embTable(0L -> Seq(1f, 0f, 0f, 0f), 1L -> e1b, 2L -> e2,
      3L -> Seq(0.5f, 0.5f, 0f, 0f))
    val q = t.filter(col("vec_id") === 0L)
    val plain = Similarity.bruteForceTopK(t, q, k = 3).collect()
      .map(r => (r.getLong(3), r.getLong(1)))
    val mmr = Similarity.mmrTopK(t, q, k = 3, poolSize = 3, lambda = 1.0)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(mmr.sortBy(_._1) === plain.sortBy(_._1))
  }

  test("MMR truncates when the pool is smaller than k") {
    val t = embTable(0L -> e1, 1L -> e1b, 2L -> e2)
    val q = t.filter(col("vec_id") === 0L)
    val mmr = Similarity.mmrTopK(t, q, k = 2, poolSize = 2).collect()
    assert(mmr.length === 2)
    // only 2 non-self candidates exist; both get picked, ranks 1..2
    assert(mmr.map(_.getLong(1)).sorted === Array(1L, 2L))
  }

  test("JL projection: components equal hand-computed signed sums") {
    val t = embTable(1L -> Seq(1f, 2f, -3f, 0.5f))
    val got = Similarity.randomProject(t, dOut = 3).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    (0 until 3).foreach { p =>
      val expect = Seq(1.0, 2.0, -3.0, 0.5).zipWithIndex
        .map { case (v, j) => v * Similarity.planeSignValue(p, j) }
        .reduceLeft(_ + _)
      assert(got(p.toLong) === BigDecimal(expect)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"dim $p")
    }
  }

  test("JL projection preserves neighborhoods on the fixture embeddings") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val bf = Similarity.bruteForceTopK(e, q, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // search in the 16-dim projected space: wide-form vectors
    val proj = Similarity.randomProject(e, dOut = 16)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("value")))),
        s => s.getField("value").cast("float")).as("embedding"))
    val pq = proj.filter(col("vec_id") < 8)
    val pr = Similarity.bruteForceTopK(proj, pq, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // the fixture embeddings are near-isotropic (top-10 cosines sit in a
    // ~0.25-0.33 band with ~0.01 gaps), so no 4x compression can keep
    // that ranking sharp — require well ABOVE chance, not a high
    // absolute: chance overlap of two 10-sets in 500 is 10/499 ≈ 0.02
    val recalls = bf.keys.toSeq.map(k =>
      (bf(k) intersect pr(k)).size.toDouble / bf(k).size)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.06, s"mean projected recall@10 = $mean (chance ≈ 0.02)")
  }

  test("JL projection keeps well-separated clusters separated") {
    // three orthogonal-ish clusters in 64-dim: base direction + small
    // deterministic jitter; cluster structure is what JL promises to keep
    def vec(cluster: Int, m: Int): Seq[Float] =
      (0 until 64).map { j =>
        val base = if (j / 21 == cluster) 1.0f else 0.0f
        base + 0.05f * (((m * 64 + j) % 7) - 3)
      }
    val rows = for (c <- 0 until 3; m <- 0 until 10)
      yield ((c * 10 + m).toLong, vec(c, m))
    val t = embTable(rows: _*)
    val proj = Similarity.randomProject(t, dOut = 16)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("value")))),
        s => s.getField("value").cast("float")).as("embedding"))
    val top = Similarity.bruteForceTopK(proj, proj, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every projected top-5 neighbor stays in the query's cluster
    top.foreach { case (q, n) =>
      assert(q / 10 === n / 10, s"query $q matched cross-cluster $n")
    }
  }

  test("int8 quantization: error bounded by scale/127, zero vector safe") {
    val t = embTable(1L -> Seq(1f, -0.5f, 0.25f, 0f), 2L -> Seq(0f, 0f, 0f, 0f))
    val out = Similarity.quantizeInt8Stats(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (amax1, err1, l11) = out(1L)
    assert(amax1 === 1000000L)            // scale 1.0 on the 1e-6 grid
    // worst-dim error < scale/127 ≈ 0.007874 → under 7875 on the grid
    assert(err1 >= 0L && err1 < 7875L, s"err $err1")
    // codes: floor(±v·127): 127, -64, 31, 0 → |·| sum 222
    assert(l11 === 222L)
    assert(out(2L) === ((0L, 0L, 0L)))    // zero vector: all zero, no NaN
  }

  test("k-center greedy: farthest-point traversal with id tiebreaks") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.1f, 0.0f)),
      (3L, Array(10.0f, 0.0f)),
      (4L, Array(10.0f, 0.1f)),
      (5L, Array(5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    // seed = min id (1); round 2 argmax d²: id4 (100.01 beats id3's 100);
    // round 3 argmax running-min: id5 (49.01). Centers {1, 4, 5}.
    val r = Similarity.kCenterGreedy(emb, k = 3).orderBy("vec_id").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r.values.map(_._1).toSet === Set(1L, 4L, 5L))
    assert(r(1L) === ((1L, 0.0)))
    assert(r(2L)._1 === 1L && math.abs(r(2L)._2 - 0.01) < 1e-6)
    assert(r(3L)._1 === 4L && math.abs(r(3L)._2 - 0.01) < 1e-6)
    assert(r(4L) === ((4L, 0.0)))
    assert(r(5L) === ((5L, 0.0)))
    // k=1 degenerate: everything assigned to the seed
    val r1 = Similarity.kCenterGreedy(emb, k = 1)
    assert(r1.filter(col("center_id") === 1L).count() === 5L)
  }

  test("class centroid margins: q6 lattice means, orthogonal vs aligned") {
    import spark.implicits._
    // label 0 centroid (1e6, 0); label 1 (0, 1e6); label 2 floors its
    // 5e-7 second component to 0 on the q6 lattice → identical to 0's.
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(1.0f, 0.0f)),
      (3L, 1, Array(0.0f, 1.0f)),
      (4L, 2, Array(1.0f, 0.0000005f))
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.classCentroidMargins(emb).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(r.size === 3)
    assert(r((0, 1)) === 0.0)
    assert(r((0, 2)) === 1.0)
    assert(r((1, 2)) === 0.0)
  }

  test("bitext mining: ratio margin suppresses the hub vector") {
    import spark.implicits._
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"),
      (5L, "de")).toDF("doc_id", "lang")
    // id5 is a hub: decent cosine against BOTH sources (0.707107), but
    // its own k-NN sum is high, so the ratio margin demotes it below
    // the true matches id3/id4 (cos 0.995037, margin ≈ 1.42).
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.1f)), (4L, Array(0.1f, 1.0f)),
      (5L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val r = Similarity.bitextMine(docs, emb, "en", k = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))).toMap
    assert(r.size === 2)
    val (t1, c1, m1, p1) = r(1L)
    assert(t1 === 3L && c1 === 995037L && p1 === 1L && m1 > 1400000L)
    val (t2, c2, m2, p2) = r(2L)
    assert(t2 === 4L && c2 === 995037L && p2 === 1L && m2 === m1)
  }

  test("bitext mining is scale-invariant on the exact lattice") {
    import spark.implicits._
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"),
      (5L, "de")).toDF("doc_id", "lang")
    def embOf(s: Float) = Seq(
      (1L, Array(1.0f * s, 0.0f)), (2L, Array(0.0f, 1.0f * s)),
      (3L, Array(1.0f * s, 0.1f * s)), (4L, Array(0.1f * s, 1.0f * s)),
      (5L, Array(0.7f * s, 0.7f * s))).toDF("vec_id", "embedding")
    // ×4 is a float exponent shift (exact); cosine and therefore every
    // lattice value must be bit-identical
    val a = Similarity.bitextMine(docs, embOf(1.0f), "en", k = 2)
      .collect().map(_.toSeq).toSet
    val b = Similarity.bitextMine(docs, embOf(4.0f), "en", k = 2)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("LSH-composed bitext: candidate-restricted margins, no cartesian") {
    import spark.implicits._
    // real-ish vectors from the sf0.001 fixture so band collisions are
    // non-trivial; the LSH face must (a) plan no CartesianProduct,
    // (b) agree with the exact face's cos6 on every pair both scored,
    // (c) emit at most one row per source doc
    val d = spark.read.parquet(sf() + "/documents.parquet")
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val lsh = Similarity.bitextMineLsh(d, e, "en")
    val s = graft.PlanSweep.smellsOf(lsh)
    assert(s.cartesian === 0, "LSH face must never plan a cartesian")
    val got = lsh.collect()
    val bySrc = got.groupBy(_.getLong(0))
    assert(bySrc.values.forall(_.length == 1))
    // cos6 equality on common picks: where the LSH face's best pick
    // coincides with the exact face's, the lattice cosine is identical
    // (the margins legitimately differ — candidate-restricted k-NN sums)
    val exact = Similarity.bitextMine(d, e, "en").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val common = got.filter(r => exact.contains((r.getLong(0), r.getLong(1))))
    assert(common.nonEmpty)
    common.foreach { r =>
      assert(r.getLong(2) === exact((r.getLong(0), r.getLong(1))))
    }
  }

  test("LSH bitext edge paths: empty source side, single-language corpus") {
    import spark.implicits._
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // no docs in the source language → nothing to mine, no crash
    val deOnly = Seq((1L, "de"), (2L, "de")).toDF("doc_id", "lang")
    assert(Similarity.bitextMineLsh(deOnly, emb, "en").count() === 0)
    // ALL docs in the source language → no targets → empty
    val enOnly = Seq((1L, "en"), (2L, "en")).toDF("doc_id", "lang")
    assert(Similarity.bitextMineLsh(enOnly, emb, "en").count() === 0)
  }

  test("hard negatives: pos/hardest/semi-hard split with sentinels") {
    import spark.implicits._
    // anchor 1 (label 0): positive id2 (cos .993884); id3 (label 1) is
    // CLOSER than the positive (cos .998752) → hardest negative, but
    // ineligible for semi-hard, which falls to id4 (cos 0).
    // anchor 4 (label 2, unique): no positive → (-1, -2.0) sentinels,
    // and no semi-hard either (semi-hard needs a pos_cos to sit under).
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(0.9f, 0.1f)),
      (3L, 1, Array(1.0f, 0.05f)),
      (4L, 2, Array(0.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.hardNegatives(emb,
        emb.filter(col("vec_id").isin(1L, 4L)))
      .collect().map(x => x.getLong(0) -> x).toMap
    val a1 = r(1L)
    assert(a1.getLong(1) === 2L && math.abs(a1.getDouble(2) - 0.993884) < 1e-9)
    assert(a1.getLong(3) === 3L && math.abs(a1.getDouble(4) - 0.998752) < 1e-9)
    assert(a1.getLong(5) === 4L && a1.getDouble(6) === 0.0)
    val a4 = r(4L)
    assert(a4.getLong(1) === -1L && a4.getDouble(2) === -2.0)
    // every candidate is other-label; id2 has the highest cosine (.110432)
    assert(a4.getLong(3) === 2L && math.abs(a4.getDouble(4) - 0.110432) < 1e-9)
    assert(a4.getLong(5) === -1L && a4.getDouble(6) === -2.0)
  }

  test("planted-parallel recovery: both faces mine every planted pair") {
    import spark.implicits._
    // 8 one-to-one planted pairs on orthogonal unit vectors (the
    // make_draw --plant-parallel shape, deterministic): en doc i and de
    // doc 100+i share basis vector e_i, so cos(pair) = 1.0 against a
    // 0.0 background — the sharp-margin structure bitext mining exists
    // to find. Doc 8/en is planted WITHOUT a partner.
    def basis(i: Int): Array[Float] =
      Array.tabulate(16)(j => if (j == i) 1.0f else 0.0f)
    val docs = ((0 until 9).map(i => (i.toLong, "en")) ++
      (0 until 8).map(i => (100L + i, "de"))).toDF("doc_id", "lang")
    val emb = ((0 until 9).map(i => (i.toLong, basis(i))) ++
      (0 until 8).map(i => (100L + i, basis(i)))).toDF("vec_id", "embedding")
    def mined(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(r.length - 1)))).toMap
    val exact = mined(Similarity.bitextMine(docs, emb, "en"))
    (0 until 8).foreach { i =>
      assert(exact(i.toLong) === ((100L + i, 1L)), s"exact pair $i")
    }
    // the partnerless source's best candidate is cos-0 flat: margin
    // cannot clear the 1.0 bar, so it must NOT mine as parallel
    assert(exact(8L)._2 === 0L)
    val lsh = mined(Similarity.bitextMineLsh(docs, emb, "en"))
    (0 until 8).foreach { i =>
      assert(lsh.get(i.toLong).forall(_ == ((100L + i, 1L))), s"lsh pair $i")
    }
    // identical vectors collide in EVERY band, so all 8 pairs surface
    assert((0 until 8).forall(i => lsh.contains(i.toLong)))
    // the partnerless source may have no band collision at all (emits
    // nothing) or only flat-cosine candidates (not parallel)
    assert(lsh.get(8L).forall(_._2 == 0L))
  }
}
