package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.TableStore

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore(): TableStore = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft-pqidx").toString)

  test("incremental append: frozen codebook, idempotent, search covers both halves") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val base = e.filter(pmod(col("vec_id"), lit(2)) === 0)
    val inc = e.filter(pmod(col("vec_id"), lit(2)) === 1)
    val store = tmpStore()
    PqIndex.build(store, base)
    val cbBefore = store.read("pq_codebook").collect().toSet
    PqIndex.appendIncrement(store, inc)
    // codebook untouched; codes cover the whole corpus exactly once
    assert(store.read("pq_codebook").collect().toSet === cbBefore)
    val codes = store.read("pq_codes")
    assert(codes.select("id").distinct().count() === e.count())
    assert(codes.count() === e.count() * 8) // one row per (vector, subspace)
    // re-appending the same increment is a no-op (first write wins)
    PqIndex.appendIncrement(store, inc)
    assert(store.read("pq_codes").count() === e.count() * 8)
    // search against the incremented index = recompute with the SAME
    // frozen codebook over the union corpus
    val q = e.filter(col("vec_id") < 4)
    val got = PqIndex.search(store, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val cents = store.read("pq_codebook")
    val expect = KMeans.pqSearchFrom(
        KMeans.pqAssignments(base, cents).unionByName(
          KMeans.pqAssignments(inc, cents)),
        cents, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    // and results draw from both halves
    assert(got.exists(_._2 % 2 == 0) && got.exists(_._2 % 2 == 1))
    e.unpersist()
  }

  test("incremental append co-locates each id's rows in one file (torn-write safety)") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
    val store = tmpStore()
    PqIndex.build(store, e.filter(pmod(col("vec_id"), lit(2)) === 0))
    PqIndex.appendIncrement(store, e.filter(pmod(col("vec_id"), lit(2)) === 1))
    // every id's 8 (id, sub) rows live in exactly one parquet file: a
    // crash that persists a file subset can then never expose a torn id
    val perFile = store.read("pq_codes")
      .select(col("id"), input_file_name().as("f"))
      .groupBy(col("id")).agg(countDistinct(col("f")).as("nf"))
    assert(perFile.filter(col("nf") > 1).count() === 0)
    // and no stage leftovers
    assert(!store.exists("pq_codes.stage"))
  }

  test("ivf index: per-file cell ranges are disjoint and search prunes to probed cells") {
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val store = tmpStore()
    PqIndex.buildIvf(store, e, codesFiles = 4)

    // --- layout: each codes file covers a cell range that does not
    // overlap any other file's interior (range-clustered on (cell, id))
    val files = new java.io.File(store.path("ivfpq_codes")).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1, "need multiple files for a pruning claim")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("cell")), max(col("cell"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"file cell ranges overlap: hi=$hi > next lo=$lo2")
    }

    // --- search equals the in-query recompute path (same kernel)
    val q = e.filter(col("vec_id") < 8)
    val got = PqIndex.searchIvf(store, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = KMeans.ivfPqTopK(e, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)

    // --- the probed-cell IN filter reaches the parquet scan (file/row-
    // group pruning on footer stats — the nProbe/K read the index exists
    // for) and the residual variant agrees with ITS recompute path too
    val plan = PqIndex.searchIvf(store, q, topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(cell"),
      s"probed-cells filter not pushed to the codes scan:\n$plan")

    PqIndex.buildIvfResidual(store, e)
    val gotR = PqIndex.searchIvfResidual(store, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expectR = KMeans.ivfPqResidualTopK(e, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotR === expectR)
    e.unpersist()
  }

  test("a build that dies mid-way leaves no completion marker; the lazy search rebuilds") {
    // ADVICE r7 #3: gating a lazy rebuild on one table existing would
    // read a partial index. Simulate the mid-build crash the finding
    // describes: a finished build minus its marker and codebook — the
    // state left by a build that died between the coarse write and the
    // codebook write (codes from an OLDER build still on disk).
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val store = tmpStore()
    PqIndex.buildIvfResidual(store, e)
    assert(PqIndex.isComplete(store, "ivfpqr"))
    store.drop("ivfpqr_complete")
    store.drop("ivfpqr_codebook")
    assert(store.exists("ivfpqr_codes"), "partial state should keep codes")
    assert(!PqIndex.isComplete(store, "ivfpqr"),
      "marker must not survive a partial build")
    // the standalone entry point must detect the partial index and
    // rebuild — results identical to the recompute path
    val q = e.filter(col("vec_id") < 8)
    if (!PqIndex.isComplete(store, "ivfpqr")) // = qSimIvfPqResIndexed's gate
      PqIndex.buildIvfResidual(store, e)
    val got = PqIndex.searchIvfResidual(store, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = KMeans.ivfPqResidualTopK(e, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    assert(PqIndex.isComplete(store, "ivfpqr"))
    e.unpersist()
  }

  test("a fingerprint-mismatched marker reads stale and ensure rebuilds (ADVICE r13)") {
    // the r13 finding: scratch dirs are keyed on (PID, data-dir hash),
    // outlive the driver's in-place data regeneration, and PID reuse can
    // resurrect them — an existence-only marker then serves an index of
    // the OLD embeddings. The marker now records (row count, content
    // hash) and a mismatch forces a rebuild.
    val e = graft.Tables.load(spark, sf(), "embeddings").cache()
    val store = tmpStore()
    PqIndex.buildIvfResidual(store, e)
    assert(PqIndex.isComplete(store, "ivfpqr"))
    assert(PqIndex.isCurrent(store, e, "ivfpqr"))
    // "regenerated" corpus: one row dropped — same path, different data
    val shifted = e.filter(col("vec_id") =!= 0).cache()
    assert(!PqIndex.isCurrent(store, shifted, "ivfpqr"),
      "marker must not claim completeness for different embeddings")
    // a legacy existence-only marker (pre-fingerprint schema) is stale too
    store.overwrite("ivfpqr_complete", spark.range(1).toDF("ok"))
    assert(!PqIndex.isCurrent(store, e, "ivfpqr"))
    // ensure on the shifted corpus rebuilds and the index serves it
    PqIndex.ensureIvfResidual(store, shifted)
    assert(PqIndex.isCurrent(store, shifted, "ivfpqr"))
    val q = shifted.filter(col("vec_id") < 8)
    val got = PqIndex.searchIvfResidual(store, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = KMeans.ivfPqResidualTopK(shifted, q, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    shifted.unpersist(); e.unpersist()
  }
}
