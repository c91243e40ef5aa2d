package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.store.TableStore
import Hashing.numHashes

/** Incremental MinHash-LSH index maintenance — the cross-RUN form of
  * [[Dedup.minhashNearDups]]: a persisted (bands, signatures) index lets
  * each day's crawl increment find its near-dups against everything ever
  * ingested WITHOUT re-shingling the corpus. Per-increment cost is
  * O(increment + band matches) plus one id-column pass over the index,
  * never a re-shingle of the corpus — the property that makes continuous
  * dedup viable at 100 TB (the full-corpus re-run isn't).
  *
  * Index layout (two tables in a [[TableStore]]):
  *  - `<name>_bands`: (id, band, bh) — the LSH bucket keys;
  *  - `<name>_sigs`:  (id, mh0..mh{k-1}) — full signatures for scoring.
  *
  * Re-ingested ids are FIRST-WRITE-WINS: an increment row whose id is
  * already indexed is dropped before shingling (anti-join against the
  * stored id column — a one-column pruned scan; at extreme scale an
  * id-Bloom prefilter, see [[graft.functions.BloomOps]], cuts that to a
  * projection). Without this, a revisited id would accrete duplicate
  * index rows and multiply future pair results.
  *
  * New-vs-old pairs are scored by SIGNATURE-estimated Jaccard (matching
  * lanes / k) because the index intentionally stores no text; estimates
  * are exact 1/k-grid rationals (k = 16 ⇒ exact in binary), and exact
  * verification can always re-read the two documents' text by id.
  * Determinism: same content ⇒ same signatures ⇒ same pairs, regardless
  * of which increment a document arrived in.
  */
object IncrementalDedup {

  private def bandsName(name: String) = s"${name}_bands"
  private def sigsName(name: String) = s"${name}_sigs"

  private val sigsSchema = StructType(
    StructField("id", LongType) +:
      (0 until numHashes).map(i => StructField(s"mh$i", LongType)))
  private val bandsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("band", IntegerType, nullable = false),
    StructField("bh", StringType)))

  /** Ingest one increment: returns near-dup pairs (new-vs-index and
    * new-vs-new, estimated Jaccard ≥ threshold), then appends the
    * increment's bands+signatures to the index. Pair orientation: id_a is
    * always the already-indexed (or lower-id) side. */
  def indexIncrement(newDocs: DataFrame, store: TableStore, name: String,
      threshold: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val oldBands = store.readOrEmpty(bandsName(name), bandsSchema)
    val oldSigs = store.readOrEmpty(sigsName(name), sigsSchema)

    // first-write-wins: drop increment rows whose id is already indexed
    val fresh = newDocs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(oldSigs.select(col("id")), Seq("id"), "left_anti")
    val sh = Dedup.shingles(fresh, 3, "id", "text")
    val sigs = Dedup.minhashSignatures(sh).localCheckpoint(true)
    val newBands = Dedup.lshBands(sigs).localCheckpoint(true)

    // candidates: new bucket keys vs the index, plus within the increment.
    // The INCREMENT side broadcasts — the corpus-sized index is streamed
    // map-side with no shuffle; shuffling the index every day would make
    // the increment cost O(corpus) and defeat the design.
    val vsOld = oldBands.as("l").join(broadcast(newBands.as("r")),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.id") =!= col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
    val vsNew = Dedup.lshCandidates(newBands)
    val cands = vsOld.unionByName(vsNew).distinct()
      .localCheckpoint(true) // three consumers below (two prunes + join)

    // prune stored signatures to candidate ids BEFORE joining — the sigs
    // table is corpus-sized and must not shuffle; band-match volume is
    // increment-scale, so the id set broadcasts (with an id-clustered
    // layout the semi-join also skips files on footer ranges)
    val candIds = cands.select(col("id_a").as("id"))
      .union(cands.select(col("id_b").as("id"))).distinct()
    val sigsNeeded = oldSigs.unionByName(sigs)
      .join(broadcast(candIds), Seq("id"), "left_semi")
      .localCheckpoint(true)
    val estJaccard = (0 until numHashes)
      .map(i => when(col(s"a.mh$i") === col(s"b.mh$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / numHashes.toDouble
    val pairs = cands
      .join(sigsNeeded.as("a"), col("id_a") === col("a.id"))
      .join(sigsNeeded.as("b"), col("id_b") === col("b.id"))
      .select(col("id_a"), col("id_b"), estJaccard.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .localCheckpoint(true) // pin results BEFORE the index mutates below

    store.append(bandsName(name), newBands)
    store.append(sigsName(name), sigs)
    pairs
  }
}
