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
}
