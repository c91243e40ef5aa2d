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
  *
  * Crash ordering (the [[IncrementalLm]] contract, ADVICE r15): every
  * mutating face commits output (through `emit`) → first-write-wins
  * ledger → derived state, each via [[TableStore.appendStaged]], so a
  * single crash + at-least-once retry biases toward UNDER-detection and
  * can never duplicate index rows or emit conflicting outputs:
  *  - crash before the ledger lands → the retry recomputes against the
  *    unchanged index and re-emits bit-identical rows (batch-stamped
  *    sinks dedup the duplicate emission);
  *  - crash after the ledger, before the derived tables → the retry
  *    skips the increment (output already out); the docs sit in the
  *    ledger without sizes/bands, so future candidates can miss them —
  *    a detection hole, not corruption. Derived state commits sizes
  *    BEFORE bands (ADVICE r16): sizes (shingle counts) are not
  *    recoverable from signatures, but bands are a pure function of
  *    them — so whichever single append the crash tears, the hole is in
  *    a table [[rebuildBands]] fully repairs.
  * The ledger-LAST alternative re-appends the derived rows on retry —
  * duplicate bands double candidate generation and duplicate sizes
  * double containment pair rows; inflation is the worse failure.
  */
object IncrementalDedup {

  private def bandsName(name: String) = s"${name}_bands"
  private def sigsName(name: String) = s"${name}_sigs"
  private def sizesName(name: String) = s"${name}_sizes"

  private val sigsSchema = StructType(
    StructField("id", LongType) +:
      (0 until numHashes).map(i => StructField(s"mh$i", LongType)))
  private val bandsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("band", IntegerType, nullable = false),
    StructField("bh", StringType)))
  // distinct-shingle count per doc — 16 B/doc, the only extra state the
  // containment face needs (VERDICT r13 #5)
  private val sizesSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sz", LongType)))

  /** Ingest one increment: returns near-dup pairs (new-vs-index and
    * new-vs-new, estimated Jaccard ≥ threshold), then appends the
    * increment's bands+signatures to the index. Pair orientation: id_a is
    * always the already-indexed (or lower-id) side. `emit` runs on the
    * pinned pairs BEFORE the index mutates (the crash-ordering contract
    * above) — sinks durable-write their pairs through it. */
  def indexIncrement(newDocs: DataFrame, store: TableStore, name: String,
      threshold: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text", emit: DataFrame => Unit = _ => ()): DataFrame = {
    val oldBands = store.readOrEmpty(bandsName(name), bandsSchema)
    val oldSigs = store.readOrEmpty(sigsName(name), sigsSchema)

    // first-write-wins: drop increment rows whose id is already indexed
    val fresh = newDocs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(oldSigs.select(col("id")), Seq("id"), "left_anti")
    // checkpointed: feeds the signatures AND the sizes column the
    // containment face reads — one shingle pass either way
    val sh = Dedup.shingles(fresh, 3, "id", "text").localCheckpoint(true)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      .localCheckpoint(true)
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

    // output → ledger (sigs: the first-write-wins key) → derived state.
    // Within derived state, sizes commit BEFORE bands (ADVICE r16): bands
    // are rebuildable from sigs ([[rebuildBands]]) but sizes (shingle
    // counts) are NOT recoverable from signatures — with bands last, any
    // single-crash hole lands in the repairable table.
    emit(pairs)
    store.appendStaged(sigsName(name), sigs)
    store.appendStaged(sizesName(name), sizes)
    store.appendStaged(bandsName(name), newBands)
    pairs
  }

  /** Re-derive the bands table from the signatures ledger — closes the
    * detection hole a crash between the sigs and bands appends leaves
    * (see the crash-ordering contract above). Bands are a pure function
    * of signatures, so the rebuild is total and idempotent; the
    * tmp-then-swap overwrite keeps readers consistent throughout. */
  def rebuildBands(store: TableStore, name: String): Unit =
    store.overwrite(bandsName(name),
      Dedup.lshBands(store.readOrEmpty(sigsName(name), sigsSchema)))

  /** Ingest one increment and return CONTAINMENT-estimate pairs — the
    * streaming/incremental face of [[Dedup.containmentEstFromPostings]]
    * (VERDICT r13 #5): the same standing (bands, signatures, sizes)
    * index, the same LSH candidates (new-vs-index + new-vs-new), scored
    * with the size-corrected lane estimator instead of symmetric
    * Jaccard — excerpt/quote detection at O(increment) cost. Both
    * directions of every candidate are returned ((id, container_id,
    * containment_est), the [[Dedup.containmentPairs]] orientation).
    * First-write-wins idempotence, the index-never-shuffles discipline
    * and the emit-first crash ordering are inherited verbatim from
    * [[indexIncrement]]; docs indexed before the sizes column existed
    * simply drop out of containment scoring (inner join on sizes)
    * rather than erroring. */
  def containmentEstIncrement(newDocs: DataFrame, store: TableStore,
      name: String, threshold: Double = 0.8, idCol: String = "doc_id",
      textCol: String = "text", emit: DataFrame => Unit = _ => ()): DataFrame = {
    val oldBands = store.readOrEmpty(bandsName(name), bandsSchema)
    val oldSigs = store.readOrEmpty(sigsName(name), sigsSchema)
    val oldSizes = store.readOrEmpty(sizesName(name), sizesSchema)

    val fresh = newDocs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(oldSigs.select(col("id")), Seq("id"), "left_anti")
    val sh = Dedup.shingles(fresh, 3, "id", "text").localCheckpoint(true)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      .localCheckpoint(true)
    val sigs = Dedup.minhashSignatures(sh).localCheckpoint(true)
    val newBands = Dedup.lshBands(sigs).localCheckpoint(true)

    val vsOld = oldBands.as("l").join(broadcast(newBands.as("r")),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.id") =!= col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
    val vsNew = Dedup.lshCandidates(newBands)
    val cands = vsOld.unionByName(vsNew).distinct()
      .localCheckpoint(true)

    val candIds = cands.select(col("id_a").as("id"))
      .union(cands.select(col("id_b").as("id"))).distinct()
    val sigsNeeded = oldSigs.unionByName(sigs)
      .join(broadcast(candIds), Seq("id"), "left_semi")
      .localCheckpoint(true)
    val sizesNeeded = oldSizes.unionByName(sizes)
      .join(broadcast(candIds), Seq("id"), "left_semi")
    val agree = Dedup.laneAgreement(sigsNeeded, cands)
    val pairs = Dedup
      .containmentFromAgreement(agree, sizesNeeded, threshold)
      .localCheckpoint(true) // pin results BEFORE the index mutates below

    // output → ledger (sigs) → sizes → bands — the class contract
    // (sizes before bands so the only possible hole is rebuildable)
    emit(pairs)
    store.appendStaged(sigsName(name), sigs)
    store.appendStaged(sizesName(name), sizes)
    store.appendStaged(bandsName(name), newBands)
    pairs
  }

  // ------------------------------------------- paragraph dedup (r10 #6)

  private def paraDigestsName(name: String) = s"${name}_paradigests"
  private def paraDocsName(name: String) = s"${name}_paradocs"

  private def paraDigestsSchema = StructType(Seq(
    StructField("dg", StringType)))
  private def paraDocsSchema(idCol: String) = StructType(Seq(
    StructField(idCol, LongType)))

  /** Incremental face of [[Dedup.paragraphDedup]]: a standing set of
    * already-kept paragraph digests makes each increment's dedup
    * O(increment) — the corpus is never re-split, and a paragraph first
    * seen in ANY earlier increment is dropped from every later one.
    *
    * Equivalence: when increments arrive in ascending id order (the
    * natural shape — ids are minted monotonically by ingestion), the
    * union of the increments' outputs is EXACTLY the full-corpus
    * [[Dedup.paragraphDedup]]: the global keep-first winner of a digest
    * lives in the earliest increment containing it, which is the one
    * that appends it to the state. Re-ingested ids are first-write-wins
    * (anti-join on the doc-id table), so replaying an increment is a
    * no-op.
    *
    * Scale shape: the state is corpus-paragraph-sized and is NEVER
    * shuffled — the increment's distinct digests broadcast into a
    * semi-join that extracts only the hit rows (one digest-column
    * pruned scan of the state), and the increment anti-joins those
    * hits, again broadcast. Keep-first within the increment is the same
    * min-struct aggregate as the batch operator.
    *
    * Crash ordering (class contract): emit → doc ledger → kept digests.
    * A crash between ledger and digests leaves a digest hole — a later
    * increment may re-keep a paragraph that was already emitted (under-
    * dedup). The digests-FIRST order this replaced was strictly worse:
    * the retry saw its own digests as "already kept by an earlier
    * increment" and emitted every paragraph as dropped — a WRONG
    * cleaned_text for the whole increment, not just a weaker dedup. */
  def paragraphDedupIncrement(store: TableStore, name: String,
      newDocs: DataFrame, sep: String = "\n", idCol: String = "doc_id",
      textCol: String = "text", emit: DataFrame => Unit = _ => ()): DataFrame = {
    val oldDg = store.readOrEmpty(paraDigestsName(name), paraDigestsSchema)
    val seenIds = store.readOrEmpty(paraDocsName(name), paraDocsSchema(idCol))
    val fresh = newDocs.select(col(idCol), col(textCol).as("t"))
      .join(seenIds, Seq(idCol), "left_anti")
      .localCheckpoint(true) // consumed by paras, totals, and the id append
    val quoted = java.util.regex.Pattern.quote(sep)
    val withDg = fresh.select(col(idCol),
        posexplode(split(col("t"), quoted)))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("col").as("para"), md5(col("col")).as("dg"))
      .localCheckpoint(true)
    // digests already kept by earlier increments: increment digests
    // broadcast against the standing state — state streams map-side
    val hits = oldDg.join(
      broadcast(withDg.select(col("dg")).distinct()), Seq("dg"), "left_semi")
    val survivors = withDg.join(broadcast(hits), Seq("dg"), "left_anti")
    val keeper = survivors.groupBy(col("dg"))
      .agg(min(struct(col(idCol), col("pos"))).as("keep"))
    val kept = survivors.join(keeper, Seq("dg"))
      .filter(col(idCol) === col("keep").getField(idCol) &&
        col("pos") === col("keep").getField("pos"))
      .localCheckpoint(true) // feeds both the rebuild and the state append
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          p => p.getField("para"))).as("clean_text"))
    val totals = fresh.select(col(idCol),
      size(split(col("t"), quoted)).cast("long").as("n_paragraphs"))
    val out = totals.join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_paragraphs"),
        (col("n_paragraphs") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped_paras"))
      .localCheckpoint(true) // pin results BEFORE the state mutates
    emit(out)
    store.appendStaged(paraDocsName(name), fresh.select(col(idCol)))
    store.appendStaged(paraDigestsName(name), kept.select(col("dg")))
    out
  }

  // ---------------------------------------- containment index (r10 #6)

  private def contShName(name: String) = s"${name}_contsh"

  private def contShSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("shingle", StringType)))

  /** Ingest one increment into the standing containment shingle index:
    * each document's text is shingled exactly ONCE, ever (first-write-
    * wins by id), and the postings append. Cost: O(increment) — one scan
    * of the new docs plus a one-column id pass over the index. Returns
    * the increment's per-doc posting counts. */
  def containmentIncrement(store: TableStore, name: String,
      newDocs: DataFrame, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val old = store.readOrEmpty(contShName(name), contShSchema)
    val fresh = newDocs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(old.select(col("id")), Seq("id"), "left_anti")
    val sh = Dedup.shingles(fresh, n, "id", "text").localCheckpoint(true)
    // postings double as the first-write-wins ledger: repartition by id
    // so each doc's postings land in ONE staged file — a torn move
    // leaves whole docs only, and the retry re-ingests exactly the
    // missing ones (appendStaged's co-located-key contract)
    store.appendStaged(contShName(name), sh.repartition(col("id")))
    sh.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
  }

  /** Containment verdicts over EVERYTHING ingested so far — identical to
    * a full-corpus [[Dedup.containmentPairs]] recompute (the df cap is
    * computed over the global accumulated postings), but reading digest
    * postings only: document text is never re-scanned. At 100 TB the
    * readout runs over an id-clustered postings table and restricts to
    * LSH candidate buckets; here it is the exact form. */
  def containmentState(store: TableStore, name: String,
      threshold: Double = 0.8, maxDocFreq: Int = 64): DataFrame =
    Dedup.containmentFromPostings(
      store.readOrEmpty(contShName(name), contShSchema), threshold,
      maxDocFreq)
}
