package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import Hashing._

/** Eval-set decontamination (north star; no reference equivalent): flag
  * training documents that share word n-grams with a held-out benchmark
  * set, the standard pre-training hygiene pass (13-gram overlap in GPT-3's
  * appendix; smaller n here because the synthetic corpus is short-doc).
  *
  * Scale shape: the eval side is small by construction (benchmarks are
  * thousands of documents, not billions), so its distinct grams broadcast
  * — the corpus is touched ONCE by a scan + explode + broadcast hash join,
  * never a shuffle of the text. Both aggregations are map-side combined
  * counts keyed by doc id. For a pathological eval set too big to
  * broadcast, the same plan minus the hint degrades to one shuffled
  * equi-join on the gram hash — still never all-pairs.
  */
object Decontamination {

  /** Per-document overlap against `eval`: distinct n-grams, how many of
    * them appear anywhere in the eval set, and the contaminated fraction
    * on the fixed 4-decimal grid (integer floor-division — same
    * engine-independence argument as [[TextAnalysis.qualityScore]]; the
    * products stay < 2^53·10⁴ for any physically possible gram count).
    * Documents with fewer than n words carry zero grams and report clean.
    */
  def overlapStats(docs: DataFrame, eval: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    overlapStatsAgainstGrams(docs, evalGrams(eval, n, textCol), n,
      idCol, textCol)

  /** The eval side's whole state: its distinct word n-grams. Benchmark
    * sets are metadata-sized, so this is the broadcastable (and, for the
    * incremental path, persistable) form of the eval set. */
  def evalGrams(eval: DataFrame, n: Int = 3,
      textCol: String = "text"): DataFrame =
    eval
      .select(explode(array_distinct(ngrams(words(col(textCol)), n))).as("gram"))
      .distinct()

  /** [[overlapStats]] against a pre-extracted gram state — the entry the
    * incremental path reuses so a standing eval set is never re-gram'd
    * per increment. */
  def overlapStatsAgainstGrams(docs: DataFrame, evalGrams: DataFrame,
      n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val docGrams = docs.select(col(idCol),
      explode(array_distinct(ngrams(words(col(textCol)), n))).as("gram"))
    // ONE pass over the exploded gram stream (r18, guide §2.4 — the
    // boilerplateStats/overlapProfile lesson applied to the original
    // operator): the old separate totals/hits branches each re-ran the
    // corpus tokenize+explode; a broadcast LEFT join marks hits and a
    // single per-doc aggregate counts grams and hits together. Counts
    // are identical — doc grams are array_distinct'd and evalGrams is
    // distinct, so the inner-join multiplicity the old hits branch
    // counted was exactly the number of marked rows here.
    val per = docGrams
      .join(broadcast(evalGrams.select(col("gram"))
        .withColumn("__hit", lit(1L))), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
    val c = coalesce(col("n_contaminated"), lit(0L))
    val g = coalesce(col("n_grams"), lit(0L))
    val scaled = c * lit(10000L)
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol), g.as("n_grams"), c.as("n_contaminated"),
        when(g > 0, ((scaled - pmod(scaled, g)) / g).cast("double") / 10000.0)
          .otherwise(lit(0.0)).as("contaminated_frac"),
        when(c > 0, 1L).otherwise(0L).as("is_contaminated"))
  }

  /** Contamination n-SENSITIVITY profile: overlap of corpus vs eval at
    * SEVERAL n-gram sizes in one pass — the sweep that picks the
    * operating n (GPT-3's appendix uses 13-grams; short-doc corpora
    * need smaller n; too small over-flags on common phrases, too large
    * under-flags paraphrases — this table shows the knee). One row per
    * n: docs carrying ≥1 n-gram, docs contaminated, gram totals/hits,
    * and both fractions on the frac4 lattice.
    *
    * Scale shape: the corpus is tokenized ONCE (the word array is
    * materialized as a column first — the tagged multi-n gram array is
    * built from the materialized slot, so the HOF tree can't re-split
    * the text per n) and exploded once for ALL n; the eval side's
    * tagged grams broadcast; per-(n,doc) counts are map-side combined
    * and the final rollup is |ns| rows. */
  def overlapProfile(docs: DataFrame, eval: DataFrame,
      ns: Seq[Int] = Seq(2, 3, 4, 5), idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def tagged(w: Column): Column = flatten(array(ns.map(n =>
      transform(array_distinct(ngrams(w, n)),
        g => struct(lit(n).as("n"), g.as("gram")))): _*))
    def explodeTagged(df: DataFrame, keep: Seq[Column]): DataFrame =
      df.select(keep :+ explode(tagged(col("w"))).as("tg"): _*)
        .select(keep :+ col("tg.n").as("n") :+ col("tg.gram").as("gram"): _*)
    val dg = explodeTagged(
      docs.select(col(idCol), words(col(textCol)).as("w")), Seq(col(idCol)))
    val eg = explodeTagged(
      eval.select(words(col(textCol)).as("w")), Seq.empty).distinct()
    // ONE pass over the exploded gram stream: broadcast left join marks
    // hits, a single (n, doc) aggregate counts grams and hits together —
    // separate tot/hit branches would each re-run the corpus explode
    // (the boilerplateStats lesson)
    val per = dg
      .join(broadcast(eg.withColumn("__hit", lit(1L))), Seq("n", "gram"), "left")
      .groupBy(col("n"), col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
    def frac4(num: Column, den: Column): Column = {
      val scaled = num * lit(10000L)
      when(den > 0, ((scaled - pmod(scaled, den)) / den).cast("double") / 10000.0)
        .otherwise(lit(0.0))
    }
    per
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_docs_contaminated"),
        sum(col("n_grams")).as("total_grams"),
        sum(col("n_hits")).as("total_hits"))
      .select(col("n"), col("n_docs"), col("n_docs_contaminated"),
        col("total_grams"), col("total_hits"),
        frac4(col("n_docs_contaminated"), col("n_docs")).as("doc_frac"),
        frac4(col("total_hits"), col("total_grams")).as("gram_frac"))
  }

  /** Span-level decontamination EXCISION: instead of dropping a
    * contaminated document wholesale ([[overlapStats]] → filter), cut
    * ONLY the words covered by a contaminated n-gram and keep the rest —
    * the surgical variant (Lee et al. 2022 do this for repeated
    * substrings; eval decontamination benefits identically: a 10k-token
    * document that shares one n-gram with a benchmark loses n words,
    * not 10k).
    *
    * Word-lattice semantics: the document is tokenized with the
    * canonical [[Hashing.words]] split, a word is dropped iff some
    * contaminated gram starting at index i covers it (i ≤ j ≤ i+n-1),
    * and clean_text is the surviving words space-joined — whitespace is
    * normalized by reconstruction, which is the honest contract (the
    * oracle reconstructs identically; char-exact splicing would need
    * per-word offsets that the canonical tokenizer does not keep).
    *
    * Scale shape: one corpus gram pass (explode + broadcast hash join
    * against the metadata-sized eval grams), hit indexes fold back as a
    * word-count-sized array per CONTAMINATED doc only; the rebuild is a
    * pure per-row higher-order projection — no shuffle of document text
    * at any point. */
  def exciseOverlaps(docs: DataFrame, evalGramsDf: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // checkpointed: feeds the gram explode AND the per-row rebuild
    val ws = docs.select(col(idCol), words(col(textCol)).as("w"))
      .localCheckpoint(true)
    val hits = ws
      .select(col(idCol), posexplode(ngrams(col("w"), n)).as(Seq("i", "gram")))
      .join(broadcast(evalGramsDf), Seq("gram"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("i"))).as("h"))
    val kept = filter(col("w"), (_, j) =>
      !exists(col("h"), i => j >= i && j <= i + lit(n - 1)))
    ws.join(hits, Seq(idCol), "left")
      .select(col(idCol),
        when(col("h").isNull, concat_ws(" ", col("w")))
          .otherwise(concat_ws(" ", kept)).as("clean_text"),
        coalesce(size(col("h")), lit(0)).cast("long").as("n_gram_hits"),
        when(col("h").isNull, lit(0))
          .otherwise(size(col("w")) - size(kept))
          .cast("long").as("n_words_dropped"))
  }

  /** Contamination MATRIX: overlap of a training corpus against SEVERAL
    * benchmark sets at once, rolled up per (eval_set, stratum) — the
    * release-gate readout ("which sources leak which benchmarks?") that
    * decides whether a source is dropped or re-filtered before a
    * training run. A document is contaminated w.r.t. a set when it
    * shares ≥ 1 word n-gram with that set ([[overlapStats]]' flag).
    *
    * Scale shape: the corpus is exploded ONCE for all sets — the tagged
    * union of the (metadata-sized) eval gram states broadcasts into a
    * single hash join, and everything after operates on (set, doc) /
    * (set, stratum) counts, map-side combined. Cost is one corpus gram
    * pass regardless of how many benchmarks gate the release. */
  def contaminationMatrix(docs: DataFrame, stratum: Column,
      evals: Seq[(String, DataFrame)], n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(evals.nonEmpty, "contaminationMatrix needs at least one eval set")
    val spark = docs.sparkSession
    import spark.implicits._
    val tagged = evals.map { case (nm, e) =>
      evalGrams(e, n, textCol).select(lit(nm).as("eval_set"), col("gram"))
    }.reduce(_ unionByName _)
    val d = docs.select(col(idCol), stratum.as("stratum"),
      col(textCol).as("__text")).localCheckpoint(true)
    val docGrams = d.select(col(idCol),
      explode(array_distinct(ngrams(words(col("__text")), n))).as("gram"))
    val contaminated = docGrams.join(broadcast(tagged), Seq("gram"))
      .select(col("eval_set"), col(idCol)).distinct()
    val totals = d.groupBy(col("stratum")).agg(count(lit(1)).as("n_docs"))
    val sets = evals.map(_._1).toDF("eval_set")
    val hits = contaminated.join(d.select(col(idCol), col("stratum")),
        Seq(idCol))
      .groupBy(col("eval_set"), col("stratum"))
      .agg(count(lit(1)).as("n_hit"))
    val h = coalesce(col("n_hit"), lit(0L))
    val scaled = h * lit(10000L)
    broadcast(sets).crossJoin(totals)
      .join(hits, Seq("eval_set", "stratum"), "left")
      .select(col("eval_set"), col("stratum"), col("n_docs"),
        h.as("n_contaminated_docs"),
        when(col("n_docs") > 0,
          ((scaled - pmod(scaled, col("n_docs"))) / col("n_docs"))
            .cast("double") / 10000.0)
          .otherwise(lit(0.0)).as("contaminated_frac"))
  }

  /** Embedding-space decontamination — the SEMANTIC sibling of
    * [[overlapStats]]: flags training items whose embedding is
    * cosine-close to ANY eval-set embedding, catching the
    * paraphrase/translation contamination that lexical n-gram overlap
    * cannot see. Output per training item: the closest eval item, the
    * max cosine, and the threshold flag.
    *
    * Scale shape mirrors the lexical pass: the eval side is small by
    * construction, so its vectors BROADCAST and the corpus is touched
    * ONCE by a broadcast scoring pass (O(|eval|·dim) per corpus row —
    * no shuffle of the corpus, never an all-pairs product); the per-item
    * argmax is a map-side-combined struct max, not a window. An eval set
    * past broadcast size composes with the IVF/PQ index instead (probe
    * the eval vectors' cells only). The threshold compares the ROUNDED
    * 6-dp cosine, and ties pick the smallest eval id — both
    * engine-portable, so the flag itself is oracle-checkable. */
  def semanticOverlap(emb: DataFrame, evalEmb: DataFrame,
      threshold: Double = 0.4, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import Similarity.{cosine, dot, norm, toDouble}
    val c = emb.select(col(idCol), toDouble(col(embCol)).as("c_emb"))
      .withColumn("c_norm", norm(col("c_emb")))
    val q = evalEmb.select(col(idCol).as("eval_id"),
        toDouble(col(embCol)).as("q_emb"))
      .withColumn("q_norm", norm(col("q_emb")))
    val scored = c.crossJoin(broadcast(q))
      .select(col(idCol),
        cosine(dot(col("c_emb"), col("q_emb")),
          col("c_norm"), col("q_norm")).as("cos"),
        col("eval_id"))
    val best = scored.groupBy(col(idCol))
      .agg(max(struct(col("cos"), (-col("eval_id")).as("neg"))).as("best"))
    // left-join the argmax back onto the corpus (ADVICE r9): an EMPTY
    // eval set leaves `best` empty, and a bare groupBy would then drop
    // every training item — the literal twin's contract (all rows clean,
    // null best/cos) must hold on this face too
    emb.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        (-col("best.neg")).as("best_eval_id"),
        col("best.cos").as("max_cos"),
        when(col("best.cos") >= threshold, 1L).otherwise(0L)
          .as("is_contaminated"))
  }

  /** ANN-routed face of [[semanticOverlap]] for eval sets past
    * broadcast size (VERDICT r13 #3 — semanticOverlap's own docstring
    * caveat, now an operator): the TRAIN corpus is indexed ONCE
    * (persisted cell-clustered IVF-PQ via [[PqIndex]] — the corpus-scale
    * job, amortized), the eval vectors run as QUERIES against it
    * (cell-probed ADC: ~|eval|·nProbe/coarseK code lookups, never
    * eval × corpus), and the surviving candidates — ≤ |eval|·topK rows,
    * bounded — are re-scored with the EXACT rounded cosine and reduced
    * per train item under the same (max cos, smallest eval id) rule.
    *
    * Output schema and flag semantics identical to [[semanticOverlap]].
    * Because the threshold decision re-runs on exact cosines, the
    * indexed flag set is a SUBSET of the exact one (precision 1 by
    * construction); what the routing can lose is RECALL — a
    * contaminated train item can sit outside an eval query's probed
    * cells or below its topK. That loss is measured, not assumed:
    * `q_decontam_semantic_indexed_eval` grades this path against the
    * broadcast-exact one (the q_sim_recall_eval discipline). */
  def semanticOverlapIndexed(store: graft.store.TableStore, emb: DataFrame,
      evalEmb: DataFrame, threshold: Double = 0.4, topK: Int = 32,
      nProbe: Int = 3, name: String = "ivfpq",
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    import Similarity.{cosine, dot, norm, toDouble}
    // idCol/embCol thread through the build + fingerprint check too
    // (ADVICE r14): a caller on non-default column names must build and
    // verify against ITS columns, not a hardcoded vec_id/embedding
    PqIndex.ensureIvf(store, emb, name, idCol = idCol, embCol = embCol)
    val cands = PqIndex.searchIvf(store, evalEmb, topK, name, nProbe,
        idCol = idCol, embCol = embCol)
      .select(col("query_id").as("eval_id"), col("neighbor_id"))
    val c = emb.select(col(idCol).as("neighbor_id"),
        toDouble(col(embCol)).as("c_emb"))
      .withColumn("c_norm", norm(col("c_emb")))
    val q = evalEmb.select(col(idCol).as("eval_id"),
        toDouble(col(embCol)).as("q_emb"))
      .withColumn("q_norm", norm(col("q_emb")))
    val scored = cands
      .join(c, Seq("neighbor_id"))
      .join(q, Seq("eval_id"))
      .select(col("neighbor_id").as(idCol),
        cosine(dot(col("c_emb"), col("q_emb")),
          col("c_norm"), col("q_norm")).as("cos"),
        col("eval_id"))
    val best = scored.groupBy(col(idCol))
      .agg(max(struct(col("cos"), (-col("eval_id")).as("neg"))).as("best"))
    // left join onto the full train id list: never-retrieved items
    // report clean with null best/cos — the semanticOverlap contract
    emb.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        (-col("best.neg")).as("best_eval_id"),
        col("best.cos").as("max_cos"),
        when(col("best.cos") >= threshold, 1L).otherwise(0L)
          .as("is_contaminated"))
  }

  /** Literal-baked twin of [[semanticOverlap]] — the STREAMING face: the
    * eval matrix collects to the driver ONCE (metadata-sized by the same
    * contract that lets the batch side broadcast it) and bakes into the
    * plan as literal arrays, turning the whole gate into a PURE
    * PROJECTION — a `greatest(struct(cos, -eval_id))` fold over |eval|
    * codegen'd cosine expressions. No join, no aggregation, no state: it
    * runs unchanged on an unbounded stream (stateless append, same
    * pattern as [[graft.streaming.EventStreams.assignStream]]), and a
    * row's verdict is identical whether it arrived by stream or by
    * backfill — the SAME rounded-cosine and smallest-eval-id-tie rule,
    * spec-asserted equal to the batch operator. Works unchanged on batch
    * frames. Empty eval set → every row clean with null best/cos. */
  def semanticOverlapLiteral(emb: DataFrame, evalEmb: DataFrame,
      threshold: Double = 0.4, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import Similarity.{cosine, dot, norm, toDouble}
    val evals = evalEmb
      .select(col(idCol), toDouble(col(embCol)).as("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    if (evals.isEmpty)
      emb.select(col(idCol), lit(null).cast("long").as("best_eval_id"),
        lit(null).cast("double").as("max_cos"), lit(0L).as("is_contaminated"))
    else {
      val withNorm = emb.select(col(idCol),
        toDouble(col(embCol)).as("__v"), norm(toDouble(col(embCol))).as("__n"))
      val best = evals.map { case (eid, v) =>
        val nv = math.sqrt(v.map(x => x * x).sum)
        struct(
          cosine(dot(col("__v"), typedlit(v)), col("__n"), lit(nv)).as("cos"),
          lit(-eid).as("neg"))
      }.reduceLeft(greatest(_, _))
      withNorm.select(col(idCol),
        (-best.getField("neg")).as("best_eval_id"),
        best.getField("cos").as("max_cos"),
        when(best.getField("cos") >= threshold, 1L).otherwise(0L)
          .as("is_contaminated"))
    }
  }

  // ------------------------------------------------- incremental state
  // The cross-RUN form (VERDICT r9 #6, mirroring IncrementalDedup
  // .indexIncrement): a standing eval-gram state plus an append-only
  // verdict table make per-increment decontamination O(increment) — the
  // corpus is never re-scanned when new docs arrive, and the eval set is
  // never re-gram'd. Verdicts are per-doc against a FIXED eval state, so
  // increment ∪ base ≡ full recompute exactly (spec-asserted).

  private def gramsName(name: String) = s"${name}_grams"
  private def verdictsName(name: String) = s"${name}_verdicts"

  private def verdictsSchema(idCol: String) =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_grams",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_contaminated",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("contaminated_frac",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("is_contaminated",
        org.apache.spark.sql.types.LongType)))

  /** Persist the eval set's gram state (metadata-sized — benchmarks are
    * thousands of docs). Re-indexing REPLACES the state; standing
    * verdicts keyed to an older eval state should be dropped with it. */
  def indexEval(store: graft.store.TableStore, name: String,
      eval: DataFrame, n: Int = 3, textCol: String = "text"): Unit =
    store.overwrite(gramsName(name), evalGrams(eval, n, textCol))

  /** Gate one increment of new training docs against the standing eval
    * state and append their verdicts. Re-ingested ids are
    * first-write-wins (anti-join on the verdict table's id column — a
    * one-column pruned scan), so replaying an increment is a no-op.
    * Returns the increment's verdicts. Cost: O(increment) — one scan of
    * the new docs, eval grams broadcast, plus the id-column pass. */
  def decontaminateIncrement(store: graft.store.TableStore, name: String,
      newDocs: DataFrame, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val grams = store.read(gramsName(name))
    val existing = store.readOrEmpty(verdictsName(name), verdictsSchema(idCol))
    val fresh = newDocs
      .join(existing.select(col(idCol)), Seq(idCol), "left_anti")
    val stats = overlapStatsAgainstGrams(fresh, grams, n, idCol, textCol)
      // materialize BEFORE the append: the plan reads the verdict table
      // (the anti-join) that the append mutates
      .localCheckpoint(true)
    store.appendStaged(verdictsName(name), stats)
    stats
  }

  /** The standing verdict table (empty-safe). */
  def decontaminationState(store: graft.store.TableStore, name: String,
      idCol: String = "doc_id"): DataFrame =
    store.readOrEmpty(verdictsName(name), verdictsSchema(idCol))

  // --------------------------------------- span-level incremental state
  // The cross-RUN form of [[Dedup.exciseCrossSpans]] (r18, completing
  // VERDICT r17 #5's operator family): a standing frozen-corpus
  // span-gram state plus an append-only rewrite table make
  // per-increment span excision O(increment) — the frozen corpus is
  // never re-gram'd and earlier increments are never re-cut. A rewrite
  // is a pure function of (doc, frozen gram state), so
  // increment ∪ base ≡ full recompute exactly (the oracle for
  // q_decontam_spans_incr IS the batch q_decontam_spans SQL).

  private def spanGramsName(name: String) = s"${name}_span_grams"
  private def spanCleanName(name: String) = s"${name}_span_clean"

  private def spanCleanSchema(idCol: String) =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("clean_text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_dropped_spans",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dropped_chars",
        org.apache.spark.sql.types.LongType)))

  /** Persist the frozen corpus's distinct span-gram hashes
    * ([[Dedup.spanGrams]]) — re-indexing REPLACES the state; standing
    * rewrites keyed to an older state should be dropped with it. */
  def indexEvalSpans(store: graft.store.TableStore, name: String,
      eval: DataFrame, k: Int = 20, textCol: String = "text"): Unit =
    store.overwrite(spanGramsName(name), Dedup.spanGrams(eval, k, textCol))

  /** Excise one increment of new docs against the standing span-gram
    * state and append the rewrites. Re-ingested ids are first-write-wins
    * (anti-join on the rewrite table's pruned id column) and
    * within-increment duplicates rewrite once, so replaying an increment
    * is a no-op. Cost: O(increment) — one gram-index pass over the new
    * docs, the frozen gram set broadcast.
    *
    * Crash ordering (the [[IncrementalLm]] contract): `emit` fires on
    * the pinned output BEFORE the rewrite table commits — a retry after
    * a crash re-cuts the batch against the unchanged state
    * (bit-identical rows; batch-stamped sinks dedup the re-emission);
    * the old order (state first) would lose a batch's output forever
    * under at-least-once delivery. */
  def exciseSpansIncrement(store: graft.store.TableStore, name: String,
      newDocs: DataFrame, k: Int = 20, idCol: String = "doc_id",
      textCol: String = "text",
      emit: DataFrame => Unit = _ => ()): DataFrame = {
    val grams = store.read(spanGramsName(name))
    val existing = store.readOrEmpty(spanCleanName(name), spanCleanSchema(idCol))
    // NOT checkpointed, deliberately: exciseCrossSpans reads its input
    // three times (gram index, rebuild side, pass-through join), but
    // each re-evaluation is a columnar scan + anti-join on pruned id
    // columns — measured CHEAPER (10.8-11.6 s for the two-increment
    // query) than pinning the increment's text through memory blocks
    // first (11.4-12.8 s): the text column only decompresses on the one
    // path that needs it
    val fresh = newDocs
      .join(existing.select(col(idCol)), Seq(idCol), "left_anti")
      .dropDuplicates(idCol)
    val out = Dedup.exciseCrossSpans(fresh, grams, k, idCol, textCol)
      // materialize BEFORE the emit/append: the plan reads the rewrite
      // table (the anti-join) that the append mutates
      .localCheckpoint(true)
    emit(out)
    store.appendStaged(spanCleanName(name), out)
    out
  }

  /** The standing rewrite table (empty-safe). */
  def spanExcisionState(store: graft.store.TableStore, name: String,
      idCol: String = "doc_id"): DataFrame =
    store.readOrEmpty(spanCleanName(name), spanCleanSchema(idCol))

  /** Span-contamination release gate — the [[contaminationMatrix]]
    * sibling at char-span granularity: per stratum (source, shard, …),
    * how many docs carry frozen-corpus spans and what fraction of the
    * stratum's CHARS those spans cover — the number that decides
    * whether a source ships, gets span-cut, or gets dropped. Doc-level
    * flags overstate: one shared license header flags a whole doc;
    * char_frac says how much text actually leaves.
    *
    * Scale shape: the dominant term is [[Dedup.exciseCrossSpans]]'
    * gram index (O(chars), ref grams broadcast); the stratum/length
    * pass rides a second scan of the same parquet, the join is id-keyed
    * on span-audit rows (ints, never text), and the rollup is
    * map-side-combined to |strata| rows. */
  def spanContaminationMatrix(docs: DataFrame, refGrams: DataFrame,
      stratum: Column, k: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cut = Dedup.exciseCrossSpans(docs, refGrams, k, idCol, textCol)
      .select(col(idCol), col("n_dropped_spans"), col("dropped_chars"))
    val base = docs.select(col(idCol), stratum.as("stratum"),
      length(col(textCol)).cast("long").as("__nc"))
    def frac4(num: Column, den: Column): Column = {
      val scaled = num * lit(10000L)
      when(den > 0,
        ((scaled - pmod(scaled, den)) / den).cast("double") / 10000.0)
        .otherwise(lit(0.0))
    }
    base.join(cut, Seq(idCol))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_dropped_spans") > 0, 1L).otherwise(0L))
          .as("n_docs_hit"),
        sum(col("__nc")).as("n_chars"),
        sum(col("dropped_chars")).as("dropped_chars"))
      .select(col("stratum"), col("n_docs"), col("n_docs_hit"),
        col("n_chars"), col("dropped_chars"),
        frac4(col("n_docs_hit"), col("n_docs")).as("doc_frac"),
        frac4(col("dropped_chars"), col("n_chars")).as("char_frac"))
  }

  /** The gate itself: training docs that survive decontamination at
    * `maxFrac` (strictly-greater rejects; 0.0 = any shared gram rejects).
    * Gated on the EXACT rational `n_contaminated ≤ maxFrac · n_grams` —
    * not the 4-decimal display fraction, whose floor would leak a doc
    * with one shared gram among > 10⁴ grams through even the strictest
    * gate. */
  def clean(docs: DataFrame, eval: DataFrame, n: Int = 3,
      maxFrac: Double = 0.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.join(
      overlapStats(docs, eval, n, idCol, textCol)
        .filter(col("n_contaminated").cast("double") <=
          lit(maxFrac) * col("n_grams").cast("double"))
        .select(col(idCol)),
      Seq(idCol), "left_semi")
}
