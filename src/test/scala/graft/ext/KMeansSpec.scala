package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def embTable(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("two well-separated blobs land in two cells with near-blob centroids") {
    // blob A around (10, 0), blob B around (-10, 0)
    val t = embTable(
      1L -> Seq(10f, 0.1f), 2L -> Seq(10.2f, -0.1f), 3L -> Seq(9.8f, 0f),
      4L -> Seq(-10f, 0.1f), 5L -> Seq(-9.9f, -0.2f), 6L -> Seq(-10.1f, 0f))
    val cents = KMeans.fit(t, k = 2, iters = 3).collect()
      .map(r => r.getSeq[Long](1))
    assert(cents.length === 2)
    // one centroid near +10·10⁴ on dim 0, the other near −10·10⁴
    val xs = cents.map(_.head).sorted
    assert(xs(0) < -90000L && xs(1) > 90000L, s"centroid x: ${xs.toSeq}")
  }

  test("a Lloyd sweep never increases integer inertia on the fit set") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    def inertia(iters: Int): Long =
      KMeans.clusterStats(e, k = 8, iters = iters)
        .agg(sum("inertia")).head().getLong(0)
    val i1 = inertia(1)
    val i2 = inertia(2)
    assert(i2 <= i1, s"sweep 2 raised inertia: $i1 -> $i2")
    e.unpersist()
  }

  test("silhouetteCentroid: separated blobs score deep, midpoint flags boundary") {
    val t = embTable(
      1L -> Seq(10f, 0f), 2L -> Seq(10.1f, 0f), 3L -> Seq(9.9f, 0f),
      4L -> Seq(-10f, 0f), 5L -> Seq(-10.1f, 0f), 6L -> Seq(-9.9f, 0f))
    val s = KMeans.silhouetteCentroid(t, k = 2, iters = 3).collect()
    assert(s.length === 2)
    s.foreach(r => assert(r.getLong(2) > 900000L,
      s"blob cell should be deep, got ${r.getLong(2)}"))
    assert(s.map(_.getLong(3)).sum === 0L)
    // a vector midway between two 10-point blobs: its own-centroid pull
    // is 1/11 of the blob, so a² ≈ 9.09², b² = 10² → sil ≈ 0.17 < 0.25
    val t2 = embTable((1L to 20L).map(i =>
      i -> Seq(if (i <= 10) 10f else -10f, 0f)) :+ (21L -> Seq(0f, 0f)): _*)
    val s2 = KMeans.silhouetteCentroid(t2, k = 2, iters = 3)
    assert(s2.agg(sum(col("n_boundary"))).head().getLong(0) === 1L)
  }

  test("distortionSweep: nested hash seeds make inertia non-increasing in k") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val rows = KMeans.distortionSweep(e, Seq(2, 4, 8), iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === Set(2L, 4L, 8L))
    assert(rows.values.map(_._1).toSet.size === 1, "n_vectors must agree")
    assert(rows(8L)._2 <= rows(4L)._2 && rows(4L)._2 <= rows(2L)._2,
      s"inertia should fall with k: $rows")
    e.unpersist()
  }

  test("ariAgainstLabels: aligned labels read 1.0, independent labels go negative") {
    val blobs = (1L to 10L).map(i => (i, Seq(10f, 0.01f * i), 0)) ++
      (11L to 20L).map(i => (i, Seq(-10f, 0.01f * i), 1))
    val t = blobs.toDF("vec_id", "embedding", "label")
    val r = KMeans.ariAgainstLabels(t, k = 2, iters = 3).head()
    assert(r.getAs[Long]("purity_q6") === 1000000L)
    assert(r.getAs[Long]("ari_q6") === 1000000L)
    // labels alternating WITHIN each blob: every cell splits 5/5, the
    // exact ARI is -1000/18000 → floor(-55555.6) = -55556 (pins the
    // negative-numerator floor both engines must share)
    val t2 = blobs.map { case (id, e, _) => (id, e, (id % 2).toInt) }
      .toDF("vec_id", "embedding", "label")
    val r2 = KMeans.ariAgainstLabels(t2, k = 2, iters = 3).head()
    assert(r2.getAs[Long]("purity_q6") === 500000L)
    assert(r2.getAs[Long]("ari_q6") === -55556L)
  }

  test("trained-IVF results carry exact cosines and usable recall") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val q = e.filter(col("vec_id") < 8)
    val ivf = KMeans.ivfTopK(e, q, k = 5, numCentroids = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bf = Similarity.bruteForceTopK(e, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bfAll = Similarity.bruteForceTopK(e, q, k = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { case (k0, cos) => assert(bfAll(k0) === cos) }
    val recall = bf.keySet.count(ivf.contains).toDouble / bf.size
    assert(recall >= 0.4, s"recall $recall")
    e.unpersist()
  }

  test("cluster stats: every corpus vector is assigned exactly once") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
    val n = e.count()
    val stats = KMeans.clusterStats(e, k = 8, iters = 2)
    assert(stats.agg(sum("n_members")).head().getLong(0) === n)
  }

  test("pq codes: total partition, codes from the seed set, exact zero error on duplicates") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val n = e.count()
    val out = KMeans.pqCodes(e, subspaces = 8, subDim = 8, k = 16, iters = 2)
    val rows = out.collect()
    assert(rows.length === n)
    // every vector carries all 8 codes and a non-negative exact error
    rows.foreach { r =>
      (1 to 8).foreach(i => assert(!r.isNullAt(i), s"null code in $r"))
      assert(r.getLong(9) >= 0L)
    }
    e.unpersist()
    // a corpus of one repeated vector quantizes exactly: qerr = 0
    val dup = (1L to 20L).map(i => (i, Seq.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val dq = KMeans.pqCodes(dup, subspaces = 2, subDim = 8, k = 4, iters = 1).collect()
    assert(dq.length === 20)
    dq.foreach(r => assert(r.getLong(3) === 0L, s"nonzero qerr: $r"))
  }

  test("pq adc search: k per query, and cross-blob queries rank own-blob neighbors first") {
    // two tight separated blobs; every query's top neighbors must come
    // from its own blob (ADC distance across blobs is ~4 orders larger)
    val rows = (0L until 10L).map(i => (i, Seq(10f + i * 0.001f, 0f, 1f, 2f))) ++
      (10L until 20L).map(i => (i, Seq(-10f - i * 0.001f, 5f, -3f, 0f)))
    val t = rows.toDF("vec_id", "embedding")
    val out = KMeans.pqTopK(t, t.filter(col("vec_id").isin(0L, 15L)),
      topK = 3, subspaces = 2, subDim = 2, k = 4, iters = 2).collect()
    assert(out.count(_.getLong(0) == 0L) === 3)
    assert(out.count(_.getLong(0) == 15L) === 3)
    out.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert((q < 10) == (n < 10), s"cross-blob neighbor: $r")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 3L)
    }
  }

  test("codegen'd dist2 equals the higher-order form, with its null semantics") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(KMeans.quantize(col("embedding")).as("q"))
      .withColumn("r", reverse(col("q")))
    val mismatch = e.filter(
      KMeans.dist2(col("q"), col("r")) =!=
        aggregate(zip_with(col("q"), col("r"), (x, y) => (x - y) * (x - y)),
          lit(0L), _ + _)).count()
    assert(mismatch === 0L)
    // null array → null, like zip_with/aggregate
    val n = e.limit(1).select(
      KMeans.dist2(lit(null).cast("array<bigint>"), col("q"))).head()
    assert(n.isNullAt(0))
  }

  test("ivf-pq with full probing equals plain ADC; narrow probing is its subset") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val q = e.filter(col("vec_id") < 4)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val full = key(KMeans.ivfPqTopK(e, q, topK = 5, coarseK = 4, nProbe = 4).collect())
    val adc = key(KMeans.pqTopK(e, q, topK = 5).collect())
    assert(full === adc) // probing every cell = no routing at all
    // narrow probing returns k rows per query with ADC values from the full table
    val narrow = KMeans.ivfPqTopK(e, q, topK = 5, coarseK = 4, nProbe = 1).collect()
    assert(narrow.groupBy(_.getLong(0)).forall(_._2.length == 5))
    val fullAdc = key(KMeans.ivfPqTopK(e, q, topK = 10000, coarseK = 4, nProbe = 4).collect())
    narrow.foreach { r =>
      assert(fullAdc((r.getLong(0), r.getLong(1)))._1 === r.getLong(2))
    }
    e.unpersist()
  }

  test("residual ivf-pq: k per query, blob separation, and usable recall vs brute force") {
    val rows = (0L until 10L).map(i => (i, Seq(10f + i * 0.001f, 0f, 1f, 2f))) ++
      (10L until 20L).map(i => (i, Seq(-10f - i * 0.001f, 5f, -3f, 0f)))
    val t = rows.toDF("vec_id", "embedding")
    val out = KMeans.ivfPqResidualTopK(t, t.filter(col("vec_id").isin(0L, 15L)),
      topK = 3, coarseK = 2, nProbe = 1, subspaces = 2, subDim = 2, pqK = 4).collect()
    assert(out.count(_.getLong(0) == 0L) === 3)
    assert(out.count(_.getLong(0) == 15L) === 3)
    out.foreach(r => assert((r.getLong(0) < 10) == (r.getLong(1) < 10), s"cross-blob: $r"))
    // on the real table: recall@5 against the EXACT L2 ranking (ADC
    // approximates euclidean distance — cosine would be the wrong oracle
    // for unnormalized vectors)
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val q = e.filter(col("vec_id") < 8)
    val res = KMeans.ivfPqResidualTopK(e, q, topK = 5, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = KMeans.pqTopK(e, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = e.select(col("vec_id").as("nid"), KMeans.quantize(col("embedding")).as("cq"))
    val exact = q.select(col("vec_id").as("qid"), KMeans.quantize(col("embedding")).as("qq"))
      .crossJoin(c).filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), KMeans.dist2(col("qq"), col("cq")).as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("d2"), col("nid"))))
      .filter(col("rn") <= 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(s: Set[(Long, Long)]) = exact.count(s.contains).toDouble / exact.size
    // random 64-d vectors concentrate distances, so absolute recall for
    // 8-byte codes is inherently modest — the invariant that matters is
    // that the shared codebook over residuals beats raw-vector codes
    // (measured here: 0.20 vs 0.05), deterministic on this fixed corpus
    assert(recall(res) >= recall(plain), s"res ${recall(res)} < plain ${recall(plain)}")
    assert(recall(res) >= 0.1, s"recall ${recall(res)}")
    e.unpersist()
  }

  test("drift report: re-assigning the base reads ~1.0, a shifted increment reads high") {
    val base = (0L until 40L)
      .map(i => (i, Seq(10f + (i % 5) * 0.01f, (i % 7) * 0.01f)))
      .toDF("vec_id", "embedding")
    val same = KMeans.driftReport(base, base, k = 4, iters = 2).collect()
    same.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"n mismatch: $r") // n_base = n_new
      val (mB, drift) = (r.getLong(3), r.getLong(5))
      assert(drift === (if (mB > 0) 10000L else 0L), s"self-drift: $r")
    }
    // an increment living far from every cell drifts ≫ 1
    val shifted = (100L until 120L)
      .map(i => (i, Seq(-50f, 30f))).toDF("vec_id", "embedding")
    val moved = KMeans.driftReport(base, shifted, k = 4, iters = 2).collect()
    assert(moved.filter(_.getLong(2) > 0).forall(_.getLong(5) > 20000L))
  }

  test("degenerate corpora: empty table and corpus smaller than k") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(KMeans.clusterStats(empty, k = 4, iters = 2).count() === 0L)
    assert(KMeans.pqCodes(empty, 2, 2, 4, 1).count() === 0L)
    // 3 vectors, k=16: seeds are just the 3 — every vector is a centroid
    val tiny = embTable(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f), 3L -> Seq(-1f, 0f))
    val st = KMeans.clusterStats(tiny, k = 16, iters = 2).collect()
    assert(st.map(_.getLong(1)).sum === 3L)
    assert(st.forall(_.getLong(2) === 0L)) // every cell exact
  }

  test("quantization is the exact 1e4 floor lattice") {
    val t = embTable(1L -> Seq(0.12345f, -0.5f, 0f))
    val q = t.select(KMeans.quantize(col("embedding"))).head().getSeq[Long](0)
    // 0.12345f widens to 0.12345000356435776 → floor 1234
    assert(q === Seq(1234L, -5000L, 0L))
  }
}
