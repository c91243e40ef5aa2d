package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import graft.store.TableStore

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = (0 until 30).map(i => s"tok$i").mkString(" ")

  test("increment N finds near-dups against everything indexed before it") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-inc").toString)
    // day 1: two unrelated docs — no pairs, index seeded
    val day1 = Seq((1L, base), (2L, "entirely different words here today ok"))
      .toDF("doc_id", "text")
    val p1 = IncrementalDedup.indexIncrement(day1, store, "idx")
    assert(p1.count() === 0)
    // day 2: an exact copy of doc 1 and a fresh doc — exactly one pair,
    // found against the PERSISTED index, est_jaccard exactly 1.0
    val day2 = Seq((10L, base), (11L, "more fresh unrelated text content"))
      .toDF("doc_id", "text")
    val p2 = IncrementalDedup.indexIncrement(day2, store, "idx").collect()
    assert(p2.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 10L)))
    assert(p2.head.getDouble(2) === 1.0)
    // day 3: another copy pairs with BOTH prior copies
    val day3 = Seq((20L, base)).toDF("doc_id", "text")
    val p3 = IncrementalDedup.indexIncrement(day3, store, "idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3 === Set((1L, 20L), (10L, 20L)))
  }

  test("within-increment pairs are found too, and index growth is additive") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-inc").toString)
    val inc = Seq((1L, base), (2L, base + " extra"), (3L, "unrelated stuff wholly"))
      .toDF("doc_id", "text")
    val pairs = IncrementalDedup.indexIncrement(inc, store, "idx", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(store.read("idx_bands").count() === 3 * Hashing.bands)
    assert(store.read("idx_sigs").count() === 3)
    // re-ingesting the same ids as a new increment pairs them with their
    // stored twins (same content ⇒ est 1.0) — determinism across runs
    val again = IncrementalDedup.indexIncrement(
      Seq((101L, base)).toDF("doc_id", "text"), store, "idx")
    assert(again.filter("id_a = 1 AND id_b = 101").count() === 1)
  }

  test("re-ingesting an already-indexed id is a no-op (first-write-wins)") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-inc").toString)
    val inc = Seq((1L, base)).toDF("doc_id", "text")
    IncrementalDedup.indexIncrement(inc, store, "idx")
    // same id again (even with different text): dropped before indexing —
    // no duplicate sigs/bands rows, no self-pair, and later increments
    // don't see multiplied rows
    val redo = IncrementalDedup.indexIncrement(
      Seq((1L, base + " mutated")).toDF("doc_id", "text"), store, "idx")
    assert(redo.count() === 0)
    assert(store.read("idx_sigs").count() === 1)
    assert(store.read("idx_bands").count() === Hashing.bands.toLong)
    val day3 = IncrementalDedup.indexIncrement(
      Seq((2L, base)).toDF("doc_id", "text"), store, "idx").collect()
    assert(day3.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(day3.length === 1) // exactly one row — no sig-row multiplication
  }

  // shared fixture for the r10 #6 incremental faces: repeated boilerplate
  // paragraphs across docs, one doc fully contained in another
  private def paraDocs = Seq(
    (1L, "alpha beta gamma\nshared footer text\nunique one"),
    (2L, "delta epsilon zeta\nshared footer text\nunique two"),
    (3L, "shared footer text\nunique three\nalpha beta gamma"),
    (4L, "totally fresh paragraph\nanother fresh one"))
    .toDF("doc_id", "text")

  test("paragraphDedupIncrement: ascending increments ∪ ≡ batch recompute") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-inc").toString)
    val inc1 = IncrementalDedup.paragraphDedupIncrement(store, "p",
      paraDocs.filter($"doc_id" <= 2))
    val inc2 = IncrementalDedup.paragraphDedupIncrement(store, "p",
      paraDocs) // re-delivers 1-2 (no-op) plus new 3-4
    val got = inc1.unionByName(inc2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val full = Dedup.paragraphDedup(paraDocs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === full)
    // O(increment): replaying an increment emits nothing and the digest
    // state holds exactly the distinct kept paragraphs
    val redo = IncrementalDedup.paragraphDedupIncrement(store, "p", paraDocs)
    assert(redo.count() === 0)
    val nDistinctParas = paraDocs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", "\n")).as("p"))
      .distinct().count()
    assert(store.read("p_paradigests").count() === nDistinctParas)
  }

  test("containmentIncrement + state ≡ batch containmentPairs; text shingled once") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-inc").toString)
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "zero one two three four five six seven eight nine ten more"),
      (3L, "completely different content in this document here"))
      .toDF("doc_id", "text")
    IncrementalDedup.containmentIncrement(store, "c",
      docs.filter($"doc_id" <= 1))
    IncrementalDedup.containmentIncrement(store, "c", docs)
    val got = IncrementalDedup.containmentState(store, "c", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.containmentPairs(docs, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === full)
    assert(got.exists { case (id, container, c) =>
      id == 1L && container == 2L && c == 1.0 })
    // first-write-wins: postings count equals a single shingling pass
    val expected = Dedup.shingles(docs, 3).count()
    assert(store.read("c_contsh").count() === expected)
    // replay: no growth
    IncrementalDedup.containmentIncrement(store, "c", docs)
    assert(store.read("c_contsh").count() === expected)
  }

  // ---- crash-ordering contract (ADVICE r15): emit → ledger → derived

  test("crash before index commit (emit throws): retry re-emits identical pairs") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-inc").toString)
    IncrementalDedup.indexIncrement(Seq((1L, base)).toDF("doc_id", "text"),
      store, "idx")
    val day2 = Seq((10L, base)).toDF("doc_id", "text")
    intercept[RuntimeException] {
      IncrementalDedup.indexIncrement(day2, store, "idx",
        emit = _ => throw new RuntimeException("pairs append died"))
    }
    // index untouched: doc 10 not ingested
    assert(store.read("idx_sigs").count() === 1)
    // retry: identical pairs, index ingests once
    var emitted = Set.empty[(Long, Long)]
    val retry = IncrementalDedup.indexIncrement(day2, store, "idx",
      emit = p => emitted =
        p.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(emitted === Set((1L, 10L)))
    assert(retry.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === emitted)
    assert(store.read("idx_sigs").count() === 2)
  }

  test("crash between sigs and bands: no duplication; rebuildBands closes the hole") {
    val failing = new TableStore(spark,
        Files.createTempDirectory("graft-inc-crash").toString) {
      private var armed = true
      override def appendStaged(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        if (name == "idx_bands" && armed) {
          armed = false
          throw new RuntimeException("crash before bands commit")
        }
        super.appendStaged(name, df)
      }
    }
    var firstPairs: Option[Long] = None
    intercept[RuntimeException] {
      IncrementalDedup.indexIncrement(Seq((1L, base)).toDF("doc_id", "text"),
        failing, "idx", emit = p => firstPairs = Some(p.count()))
    }
    assert(firstPairs === Some(0L)) // output was out before the crash
    // ledger (sigs) landed; bands did not — a detection hole, NOT dup rows
    assert(failing.read("idx_sigs").count() === 1)
    assert(!failing.exists("idx_bands") ||
      failing.read("idx_bands").count() === 0)
    // sizes committed BEFORE bands (ADVICE r16): the hole is confined to
    // the one table rebuildBands fully repairs — sizes, which is NOT
    // recoverable from signatures, is already durable
    assert(failing.read("idx_sizes").count() === 1)
    // retry skips the ledgered doc: nothing duplicates, nothing re-emits
    assert(IncrementalDedup.indexIncrement(
      Seq((1L, base)).toDF("doc_id", "text"), failing, "idx").count() === 0)
    assert(failing.read("idx_sigs").count() === 1)
    // the documented bias: doc 1 is un-banded, so a copy finds NO pair...
    IncrementalDedup.indexIncrement(
      Seq((2L, base)).toDF("doc_id", "text"), failing, "idx")
    // ...until rebuildBands re-derives bands from the sigs ledger
    IncrementalDedup.rebuildBands(failing, "idx")
    assert(failing.read("idx_bands").count() === 2 * Hashing.bands)
    val p = IncrementalDedup.indexIncrement(
      Seq((3L, base)).toDF("doc_id", "text"), failing, "idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p === Set((1L, 3L), (2L, 3L)))
  }

  test("crash on the sizes append: bands never commit ahead of sizes") {
    // the sizes → bands order means a crash tearing sizes ALSO leaves no
    // bands for the doc — there is no reachable state where a doc has
    // bands (so generates candidates) but silently drops out of
    // containment scoring for want of a size row (ADVICE r16)
    val failing = new TableStore(spark,
        Files.createTempDirectory("graft-inc-crash").toString) {
      private var armed = true
      override def appendStaged(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        if (name == "idx_sizes" && armed) {
          armed = false
          throw new RuntimeException("crash before sizes commit")
        }
        super.appendStaged(name, df)
      }
    }
    intercept[RuntimeException] {
      IncrementalDedup.containmentEstIncrement(
        Seq((1L, base)).toDF("doc_id", "text"), failing, "idx")
    }
    assert(failing.read("idx_sigs").count() === 1)
    assert(!failing.exists("idx_sizes") ||
      failing.read("idx_sizes").count() === 0)
    assert(!failing.exists("idx_bands") ||
      failing.read("idx_bands").count() === 0)
    // rebuildBands closes the candidate hole; the doc then scores again
    // in the containment face only if its size is recoverable — it isn't
    // from sigs, but the doc also never appears as a candidate until the
    // bands rebuild, so scoring stays consistent (inner join on sizes
    // drops it, the documented under-detection bias)
    IncrementalDedup.rebuildBands(failing, "idx")
    assert(failing.read("idx_bands").count() === Hashing.bands.toLong)
  }

  test("paragraph crash between ledger and digests: under-dedups, never wrong output") {
    val failing = new TableStore(spark,
        Files.createTempDirectory("graft-inc-crash").toString) {
      private var armed = true
      override def appendStaged(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        if (name == "p_paradigests" && armed) {
          armed = false
          throw new RuntimeException("crash before digests commit")
        }
        super.appendStaged(name, df)
      }
    }
    val inc1 = paraDocs.filter($"doc_id" <= 2)
    var emitted: Option[Set[(Long, String)]] = None
    intercept[RuntimeException] {
      IncrementalDedup.paragraphDedupIncrement(failing, "p", inc1,
        emit = o => emitted = Some(o.collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet))
    }
    // the emitted output is the CORRECT cleaned text (matches a clean
    // batch run over the same docs) — the old digests-first order made
    // the retry see every paragraph as already kept and emit all-dropped
    val want = Dedup.paragraphDedup(inc1).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(emitted.get === want)
    // retry: docs ledgered → emits nothing (output already out), digest
    // hole documented as under-dedup, not corruption
    assert(IncrementalDedup.paragraphDedupIncrement(failing, "p", inc1)
      .count() === 0)
    assert(failing.read("p_paradocs").count() === 2)
  }
}
