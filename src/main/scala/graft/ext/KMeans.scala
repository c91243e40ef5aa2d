package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd k-means over the embedding column — the coarse-quantizer
  * TRAINER the IVF index wants (north star; no reference equivalent).
  * [[Similarity.ivfTopK]]'s hash-sampled centroids keep that operator
  * stateless, but sampled cells are as lopsided as the data; two or three
  * Lloyd sweeps move the centroids to where the mass is, which evens cell
  * population and lets a production index keep nProbe/K small at fixed
  * recall.
  *
  * Everything runs on an INTEGER lattice so the DuckDB oracle reproduces
  * it bit-for-bit (the repo's fixed-point discipline, see
  * [[TextAnalysis.qualityScore]]):
  *  - components quantize to floor(v·10⁴) longs — float→double widening
  *    and the ·10⁴ product are IEEE-exact in both engines, floor is
  *    unambiguous;
  *  - assignment distance is the exact integer Σ(aᵢ−cᵢ)² with
  *    (distance, cent_id) tiebreak — no rounding anywhere;
  *  - the centroid update is the floor-div mean (s − pmod(s, n)) / n,
  *    an exact rational in both engines.
  * Magnitudes: |component| ≤ ~10⁵ on the lattice for embeddings in
  * [-10, 10], so per-dim squares ≤ ~4·10¹⁰ and a 4096-dim distance stays
  * < 2·10¹⁴ ≪ 2⁶³; component sums stay < 2⁵³ up to ~10⁸ members/cell
  * (beyond that, assign from a fit on a sample — see below).
  *
  * Scale shape (100 TB corpus): each Lloyd sweep is ONE corpus pass with
  * the K centroids broadcast (O(K·dim) bytes, corpus-independent) + one
  * map-side-combined shuffle keyed (cent_id, dim) whose reduce side is
  * K·dim rows — centroid state never exceeds a few MB. Sweeps are a
  * fixed small count, not convergence-driven, so the total cost is
  * `iters` scans. The production pattern is to FIT on a deterministic
  * hash-sample (`sampleMod` > 1: vec_id-hash ≡ 0 (mod m) keeps ~1/m of
  * the corpus) and then assign the full corpus once.
  */
object KMeans {

  val scale = 10000L

  /** floor(v·10⁴) per component: float → exact double → exact product →
    * unambiguous floor. Long lattice both engines agree on. Finite
    * inputs are the contract: a NaN/Inf component nulls the lattice cell
    * in Spark while DuckDB's BIGINT cast errors — scrub non-finite
    * embeddings upstream (they are corrupt data, not a vector). */
  def quantize(emb: Column): Column =
    transform(emb, v => floor(v.cast("double") * lit(scale.toDouble)).cast("long"))

  /** Exact integer squared distance between two equal-length long arrays.
    * Codegen'd [[graft.functions.SquaredDistanceLong]] — bit-identical to
    * `aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)),0L,_+_)` without the
    * per-element lambda dispatch (assignment is corpus·K·dim evaluations
    * per sweep). */
  def dist2(a: Column, b: Column): Column =
    graft.functions.ArrayOps.squaredDistanceLong(a, b)

  /** Deterministic seeds: the k corpus vectors with the smallest
    * (md5-hash(id), id) — same stateless rule as [[Similarity.ivfTopK]],
    * a TakeOrdered, not a sort. cent_id = the seed's vec_id (stable
    * through re-estimation). */
  def seedCentroids(emb: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    emb.select(col(idCol).as("cent_id"), quantize(col(embCol)).as("cq"))
      .orderBy(Hashing.hexInt(col("cent_id").cast("string")), col("cent_id"))
      .limit(k)

  /** Zero-shuffle argmin: the K centroids fold into the plan as literal
    * arrays and `least(struct(d2, cent_id))` picks the (distance,
    * id-tiebreak) minimum — a pure projection, no join, no aggregation.
    * Lexicographic struct order is exactly the argmin rule; dist2 values
    * are exact integers so ties resolve identically everywhere. Used
    * wherever the codebook is single-space and K is broadcast-sized
    * (fit sweeps, cell routing, streaming assignment); the multi-
    * codebook PQ paths keep the broadcast-join [[assign]] kernel, whose
    * m·k-way fold would blow codegen method limits. Empty centroid set →
    * null struct, callers see null cell. */
  private[graft] def argminLiteral(q: Column,
      cents: Seq[(Long, Seq[Long])]): Column =
    if (cents.isEmpty) lit(null).cast("struct<d2: bigint, cent_id: bigint>")
    else cents.map { case (cid, cq) =>
      struct(dist2(q, typedlit(cq)).as("d2"), lit(cid).as("cent_id"))
    }.reduceLeft(least(_, _))

  /** Hard assignment of every vector to its nearest fitted centroid:
    * (id, cent_id, d2). The centroids collect to the driver (k·dim
    * longs — metadata-sized) and the argmin is a zero-shuffle literal
    * projection over one corpus scan, same kernel as [[clusterStats]]. */
  def assignments(emb: DataFrame, cents: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
    assignLit(e, collectCents(cents))
      .select(col("id"), col("cent_id"), col("d2"))
  }

  /** Single-space literal assignment over (id, q) rows. */
  private def assignLit(e: DataFrame,
      cents: Seq[(Long, Seq[Long])]): DataFrame = {
    val best = argminLiteral(col("q"), cents)
    e.select(col("id"), col("q"), best.getField("cent_id").as("cent_id"),
      best.getField("d2").as("d2"))
  }

  private def collectCents(cents: DataFrame): Seq[(Long, Seq[Long])] =
    cents.select(col("cent_id"), col("cq")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq

  /** Nearest centroid per (vector, subspace): broadcast score + argmin on
    * the exact (dist2, cent_id) key. One corpus pass. The argmin is
    * `min(struct(d2, cent_id))` under a groupBy — lexicographic struct
    * order IS the (distance, id-tiebreak) rule, and the partial aggregate
    * combines map-side, so the shuffle carries ~|corpus| rows instead of
    * the |corpus|·K a sorted window over the cross-score would, with no
    * per-partition sort. This kernel serves the MULTI-codebook PQ paths
    * (one codebook per subspace); single-space assignment uses the
    * zero-shuffle [[argminLiteral]] projection instead. */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.join(broadcast(cents), Seq("sub"))
      .select(col("id"), col("sub"), col("q"),
        struct(dist2(col("q"), col("cq")).as("d2"), col("cent_id")).as("dc"))
      .groupBy(col("id"), col("sub"), col("q"))
      .agg(min(col("dc")).as("dc"))
      .select(col("id"), col("sub"), col("q"),
        col("dc.cent_id").as("cent_id"), col("dc.d2").as("d2"))

  /** Floor-div mean per (subspace, centroid, dimension), computed as ONE
    * map-side-combined aggregate per sweep (r18, guide §2.3/§2.4): the
    * elementwise [[graft.functions.ArraySumLong]] buffer replaces the
    * old posexplode → per-(sub, cent, pos) sum → collect_list/array_sort
    * reassembly, which fanned every vector out to dim rows and paid a
    * SECOND exchange to rebuild the array. Exactness is unchanged: the
    * per-dimension sums are the same commutative long additions, n is
    * the group row count (every fixed-length member contributes one
    * value per dimension), and the floor-div mean expression is
    * identical. Empty lattice slices are filtered first, preserving the
    * old explode semantics (a member with no elements contributed no
    * rows, so its (sub, cent) group never formed). A cell that loses
    * every member drops out (k shrinks) — both engines agree, and a
    * production fit re-seeds from the next hash rank instead. */
  private def step(assigned: DataFrame): DataFrame =
    assigned
      .filter(size(col("q")) > 0)
      .groupBy(col("sub"), col("cent_id"))
      .agg(graft.functions.ArraySumLong.arraySumLong(col("q")).as("s"),
        count(lit(1)).as("n"))
      .select(col("sub"), col("cent_id"),
        transform(col("s"), sv =>
          ((sv - pmod(sv, col("n"))) / col("n")).cast("long")).as("cq"))

  /** `iters` Lloyd sweeps over sub-keyed frames, centroids pinned per
    * sweep: the centroid table is K·|subs| rows, but as a lazy plan sweep
    * i would recompute sweeps 1..i-1's corpus passes inside its own
    * (O(iters²) scans); pinning keeps the total at O(iters) scans.
    * Blocks are GC-reclaimed once the returned plan is dropped. */
  private def sweeps(e: DataFrame, seed: DataFrame, iters: Int): DataFrame = {
    var cents = seed
    for (_ <- 0 until iters) cents = step(assign(e, cents)).localCheckpoint(true)
    cents
  }

  private def withSub0(df: DataFrame): DataFrame = df.withColumn("sub", lit(0))

  /** `iters` Lloyd sweeps from the hash seeds; returns (cent_id, cq) on
    * the 10⁴ lattice. `sampleMod` > 1 fits on the deterministic 1/m
    * hash-sample of the corpus — the 100 TB pattern.
    *
    * Each sweep collects the K·dim centroid longs to the driver
    * (metadata-scale, same contract as the broadcast) and assigns via
    * the [[argminLiteral]] projection: the ONLY shuffle per sweep is the
    * map-side-combined (cent_id, dim) mean update whose reduce side is
    * K·dim rows — corpus rows (and their arrays) never move. */
  def fit(emb: DataFrame, k: Int, iters: Int = 2, sampleMod: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = if (sampleMod <= 1) emb
      else emb.filter(Hashing.hexInt(col(idCol).cast("string")) % sampleMod === 0)
    val e = base.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
    var centArr = collectCents(seedCentroids(base, k, idCol, embCol))
    for (_ <- 0 until iters)
      centArr = collectCents(step(withSub0(assignLit(e, centArr))))
    centArr.toDF("cent_id", "cq")
  }

  /** Fit + final assignment, reported per cell: member count, exact
    * integer inertia (Σ dist2), and the centroid's exact L1 lattice norm
    * — the three numbers that tell an index operator whether the cells
    * are balanced and tight. All-long output, hash-comparable across
    * engines. */
  def clusterStats(emb: DataFrame, k: Int, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = fit(emb, k, iters, 1, idCol, embCol)
    val e = emb.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
    assignLit(e, collectCents(cents))
      .groupBy(col("cent_id"))
      .agg(count(lit(1)).as("n_members"), sum(col("d2")).as("inertia"))
      .join(broadcast(cents.select(col("cent_id"),
        aggregate(transform(col("cq"), abs(_)), lit(0L), _ + _).as("cent_l1"))),
        Seq("cent_id"))
      .select(col("cent_id"), col("n_members"), col("inertia"), col("cent_l1"))
  }

  /** Trained-centroid IVF: [[Similarity.ivfTopK]] with the coarse
    * quantizer from [[fit]] instead of the hash sample. Centroids
    * dequantize to doubles (exact: lattice longs < 2⁵³); assignment and
    * probing use the same rounded-cosine rule as the stateless IVF, so
    * the two are drop-in interchangeable. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCentroids: Int = 32, nProbe: Int = 8, iters: Int = 2): DataFrame = {
    val cents = fit(corpus, numCentroids, iters)
      .select(col("cent_id"),
        transform(col("cq"), v => v.cast("double") / lit(scale.toDouble)).as("ct"))
      .withColumn("ct_norm", Similarity.norm(col("ct")))
    Similarity.ivfTopKFrom(corpus, queries, k, cents, nProbe)
  }

  /** Product quantization (Jégou/Douze/Schmid 2011, cited in SCALE.md):
    * split the embedding into `subspaces` consecutive `subDim`-wide
    * blocks, run an independent Lloyd fit per block, and encode each
    * vector as its per-block nearest-centroid ids. 64 float32 dims at
    * m=8, k=16 compress to 8 small codes — the memory lever that turns a
    * RAM-bound ANN index into a scan. Output: one row per vector with
    * the m codes as columns c0..c<m-1> plus `qerr`, the EXACT integer
    * total quantization error Σ_sub dist2 (the per-corpus go/no-go number
    * for PQ, like [[Similarity.quantizeInt8Stats]] for int8).
    *
    * All subspaces train in the SAME jobs: the corpus explodes to
    * (vector, sub) rows once, centroids live in one (sub, cent_id) table
    * broadcast per sweep — m independent fits at the cost (and shuffle
    * count) of one. Seeds are the per-block slices of the k global
    * hash-order seed vectors, so seeding needs one TakeOrdered of k rows,
    * never a per-subspace corpus sort. Same integer lattice as [[fit]];
    * dims beyond subspaces·subDim are ignored (65..∞ of a 64-dim table:
    * none). */
  /** Centroid-based simplified silhouette (Rousseeuw 1987's silhouette
    * with centroid distances standing in for mean member distances —
    * the O(n·K) form large-scale cluster audits run; the exact pairwise
    * form is O(n²) and never survives 100 TB): per vector, a² = squared
    * distance to its own (nearest) centroid, b² = squared distance to
    * the second-nearest, and the separation score
    *   sil_q6 = ⌊10⁶·(b²−a²)/b²⌋ ∈ [0, 10⁶]
    * (0 when b² = 0 — duplicate centroids). Post-Lloyd assignment is
    * argmin, so b² ≥ a² always and the score reads as boundary-ness:
    * ~0 = the vector sits between two cells (SemDeDup/topic routing is
    * arbitrary there), ~10⁶ = deep inside its cell. DOCUMENTED variant:
    * squared distances on the exact lattice instead of the classic
    * euclidean — same ordering of a,b per point, no sqrt to flake
    * cross-engine.
    *
    * Output per cluster: n_members, mean_sil_q6 (floor mean), and
    * n_boundary (sil_q6 < 250 000 — the quarter-separation band). The
    * fit is [[fit]]; the scoring pass is one zero-shuffle literal
    * projection (K structs sorted per row) + a map-side-combined
    * groupBy(K) — one corpus scan beyond the fit at any scale. */
  def silhouetteCentroid(emb: DataFrame, k: Int = 8, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2 centroids, got $k")
    val dec = "decimal(38,0)"
    val cents = collectCents(fit(emb, k, iters, 1, idCol, embCol))
    val e = emb.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
    // (d2, cent_id) structs for all K centroids, sorted lexicographically
    // — elem 1 is the argmin (same tie rule as argminLiteral), elem 2 the
    // runner-up. K literal dist2 folds + one K-element sort per row.
    val ranked = sort_array(array(cents.map { case (cid, cq) =>
      struct(dist2(col("q"), typedlit(cq)).as("d2"), lit(cid).as("cent_id"))
    }: _*))
    val a2 = element_at(ranked, 1).getField("d2")
    val b2 = element_at(ranked, 2).getField("d2")
    val num = (b2 - a2).cast(dec) * lit(1000000L).cast(dec)
    val sil = when(b2 === 0L, lit(0L)).otherwise(
      ((num - pmod(num, b2.cast(dec))) / b2.cast(dec)).cast("long"))
    e.select(element_at(ranked, 1).getField("cent_id").as("cent_id"),
        sil.as("s"))
      .groupBy(col("cent_id"))
      .agg(count(lit(1)).as("n_members"), sum(col("s")).as("ssum"),
        sum(when(col("s") < 250000L, 1L).otherwise(0L)).as("n_boundary"))
      .select(col("cent_id"), col("n_members"),
        ((col("ssum") - pmod(col("ssum"), col("n_members"))) /
          col("n_members")).cast("long").as("mean_sil_q6"),
        col("n_boundary"))
  }

  /** Distortion (elbow) sweep: [[fit]] + total exact inertia for each
    * candidate k — the curve whose knee picks K for the IVF coarse
    * quantizer, SemDeDup cells, and topic routing. Each k is an
    * independent fit (iters sweeps of literal assignment + a K·dim-row
    * mean update); the sweep costs |ks| fits, nothing more — there is
    * no shared-state trick that survives different K, so the honest
    * shape is sequential fits over the same cached quantized corpus.
    * Output: (k, n_vectors, inertia, mean_d2) — mean_d2 floor-exact. */
  def distortionSweep(emb: DataFrame, ks: Seq[Int], iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(ks.nonEmpty, "distortionSweep needs at least one k")
    val e = emb.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
      .localCheckpoint(true)
    ks.map { k =>
      val cents = collectCents(fit(emb, k, iters, 1, idCol, embCol))
      val best = argminLiteral(col("q"), cents)
      e.select(best.getField("d2").as("d2"))
        .agg(count(lit(1)).as("n_vectors"), sum(col("d2")).as("inertia"))
        .select(lit(k.toLong).as("k"), col("n_vectors"), col("inertia"),
          ((col("inertia") - pmod(col("inertia"), col("n_vectors"))) /
            col("n_vectors")).cast("long").as("mean_d2"))
    }.reduce(_.unionByName(_))
  }

  /** External cluster validation against a reference labeling (Hubert &
    * Arabie 1985's Adjusted Rand Index + purity): fit, assign, cross-
    * tabulate (cluster × label), and reduce the contingency table to
    *   ARI = (Σij C(nij,2) − Σa·Σb/C(n,2)) /
    *         (½(Σa+Σb) − Σa·Σb/C(n,2))
    * with Σa/Σb the row/column C(·,2) sums — pure integer combinatorics,
    * no logs, so the whole metric is exact on the lattice:
    *   ari_q6 = ⌊10⁶·(C(n,2)·2Σij − 2ΣaΣb) / (C(n,2)·(Σa+Σb) − 2ΣaΣb)⌋
    * (both sides multiplied by 2·C(n,2) to clear the fractions; the
    * denominator is 0 only in the degenerate one-cluster-one-label case,
    * reported as 0). Purity = Σ_cluster max_label / n on the same q6
    * lattice. DOCUMENTED bound: the cleared products reach ~n⁴·10⁶, so
    * decimal(38,0) holds to n ≈ 10⁸ rows per evaluation — external
    * validation is an audit over a labeled SLICE, not a corpus sweep;
    * shard or sample beyond that (the labeled data never is that big).
    *
    * Scale shape: assignment is the zero-shuffle literal projection; the
    * contingency table is one map-side-combined groupBy of at most K·L
    * rows, and everything after is arithmetic over that K·L-row frame.
    * Output: 1 row (n, k_clusters, n_labels, purity_q6, ari_q6). */
  def ariAgainstLabels(emb: DataFrame, k: Int = 8, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val dec = "decimal(38,0)"
    def c2(x: Column): Column = {
      val xd = x.cast(dec)
      val p = xd * (xd - lit(1).cast(dec))
      ((p - pmod(p, lit(2).cast(dec))) / lit(2).cast(dec))
    }
    val cents = collectCents(fit(emb, k, iters, 1, idCol, embCol))
    val e = emb.select(col(idCol).as("id"), quantize(col(embCol)).as("q"),
      col(labelCol).cast("long").as("lbl"))
    val best = argminLiteral(col("q"), cents)
    val ct = e.select(col("lbl"), best.getField("cent_id").as("cent_id"))
      .groupBy(col("cent_id"), col("lbl")).agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    val rows = ct.groupBy(col("cent_id")).agg(sum(col("nij")).as("ai"),
      max(col("nij")).as("maxl"))
    val cols = ct.groupBy(col("lbl")).agg(sum(col("nij")).as("bj"))
    val parts = ct.agg(sum(c2(col("nij"))).as("sij"),
        count(lit(1)).as("ncells"))
      .crossJoin(broadcast(rows.agg(sum(c2(col("ai"))).as("sa"),
        sum(col("maxl")).as("pur"), sum(col("ai")).as("n"),
        count(lit(1)).as("kc"))))
      .crossJoin(broadcast(cols.agg(sum(c2(col("bj"))).as("sb"),
        count(lit(1)).as("nl"))))
    val outCols = {
      val cn2 = c2(col("n"))
      val num = (cn2 * col("sij").cast(dec) * lit(2).cast(dec) -
        lit(2).cast(dec) * col("sa").cast(dec) * col("sb").cast(dec)) *
        lit(1000000L).cast(dec)
      val den = cn2 * (col("sa") + col("sb")).cast(dec) -
        lit(2).cast(dec) * col("sa").cast(dec) * col("sb").cast(dec)
      val purN = col("pur").cast(dec) * lit(1000000L).cast(dec)
      val purD = col("n").cast(dec)
      Seq(col("n").cast("long").as("n"),
        col("kc").cast("long").as("k_clusters"),
        col("nl").cast("long").as("n_labels"),
        ((purN - pmod(purN, purD)) / purD).cast("long").as("purity_q6"),
        when(den === 0, lit(0L)).otherwise(
          ((num - pmod(num, den)) / den).cast("long")).as("ari_q6"))
    }
    parts.select(outCols: _*)
  }

  /** Assignment-drift report: fit on a BASE corpus, assign a fresh
    * INCREMENT to the same (frozen) cells, and compare per-cell mean
    * squared distances — the monitoring number that says whether
    * yesterday's coarse quantizer still fits today's data (drift ≫ 1 in
    * a cell means new vectors sit far from its centroid: re-fit, or the
    * IVF recall quietly decays). Means are floor-div exact rationals;
    * `drift_q4` = ⌊mean_new·10⁴ / max(mean_base, 1)⌋ stays integer
    * end-to-end, so the whole report is hash-exact cross-engine. A cell
    * the increment never hits reports n_new = 0 with zero drift; the
    * increment is one broadcast-assignment pass (no re-fit). */
  def driftReport(base: DataFrame, increment: DataFrame, k: Int,
      iters: Int = 2, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val cents = collectCents(fit(base, k, iters, 1, idCol, embCol))
    def cellMeans(src: DataFrame, nAs: String, mAs: String): DataFrame = {
      val e = src.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
      val s = sum(col("d2"))
      val n = count(lit(1))
      assignLit(e, cents).groupBy(col("cent_id"))
        .agg(n.as(nAs),
          ((s - pmod(s, n)) / n).cast("long").as(mAs))
    }
    val b = cellMeans(base, "n_base", "mean_d2_base")
    val i = cellMeans(increment, "n_new", "mean_d2_new")
    // decimal(38,0): mean·10⁴ brushes int64 at extreme dims/lattice values
    val dec = "decimal(38,0)"
    val scaled = coalesce(col("mean_d2_new"), lit(0L)).cast(dec) *
      lit(10000L).cast(dec)
    val dBase = greatest(col("mean_d2_base"), lit(1L)).cast(dec)
    b.join(i, Seq("cent_id"), "left")
      .select(col("cent_id"), col("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"), col("mean_d2_base"),
        coalesce(col("mean_d2_new"), lit(0L)).as("mean_d2_new"),
        ((scaled - pmod(scaled, dBase)) / dBase).cast("long").as("drift_q4"))
  }

  /** Explode a lattice (BIGINT-array) frame into per-subspace slice rows,
    * carrying `keys` through. */
  private def latticeSlices(src: DataFrame, keys: Seq[String], qfCol: String,
      subspaces: Int, subDim: Int, valAs: String): DataFrame = {
    val subs = explode(sequence(lit(0), lit(subspaces - 1)))
    src.select(keys.map(col) :+ subs.as("sub") :+ col(qfCol) : _*)
      .select(keys.map(col) :+ col("sub") :+
        slice(col(qfCol), col("sub") * lit(subDim) + lit(1), lit(subDim))
          .as(valAs) : _*)
  }

  private def pqSlices(src: DataFrame, keyAs: String, key: Column,
      subspaces: Int, subDim: Int, embCol: String): DataFrame =
    latticeSlices(src.select(key.as(keyAs), quantize(col(embCol)).as("qf")),
      Seq(keyAs), "qf", subspaces, subDim,
      if (keyAs == "id") "q" else "cq")

  /** The trained PQ codebook: (sub, cent_id, cq) after `iters` sweeps. */
  def pqFit(emb: DataFrame, subspaces: Int = 8, subDim: Int = 8,
      k: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val e = pqSlices(emb, "id", col(idCol), subspaces, subDim, embCol)
    val seedIds = emb
      .orderBy(Hashing.hexInt(col(idCol).cast("string")), col(idCol))
      .limit(k)
    sweeps(e, pqSlices(seedIds, "cent_id", col(idCol), subspaces, subDim,
      embCol), iters)
  }

  def pqCodes(emb: DataFrame, subspaces: Int = 8, subDim: Int = 8,
      k: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = pqFit(emb, subspaces, subDim, k, iters, idCol, embCol)
    val e = pqSlices(emb, "id", col(idCol), subspaces, subDim, embCol)
    val aggs = (0 until subspaces).map(s =>
      max(when(col("sub") === s, col("cent_id"))).as(s"c$s")) :+
      sum(col("d2")).as("qerr")
    assign(e, cents)
      .groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("id", idCol)
  }

  /** PQ ADC search (asymmetric distance computation): approximate top-k
    * by summed per-subspace lookup distances — the query the PQ index
    * exists for. Each query precomputes its distance TABLE (exact integer
    * dist2 from the query's block to every codebook cell: Q·m·k rows,
    * tiny); the corpus is touched only through its CODES — the scan
    * reads m small ints per vector, never the embedding, which is the
    * whole point at 100 TB (the float column stays cold on disk).
    *
    * Plan: codes explode to (id, sub, code) once, equi-join the
    * broadcast distance table on (sub, code, …query), one
    * map-side-combined sum per (query, id), TakeOrdered top-k. Shuffle
    * carries |corpus|·|queries| partial rows — |queries| is small by
    * construction (same contract as every search op here). Distances
    * are exact integers, so ranking ties resolve identically in both
    * engines via the (adc, neighbor_id) key. */
  def pqTopK(emb: DataFrame, queries: DataFrame, topK: Int,
      subspaces: Int = 8, subDim: Int = 8, k: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = pqFit(emb, subspaces, subDim, k, iters, idCol, embCol)
    pqSearchFrom(pqAssignments(emb, cents, subspaces, subDim, idCol, embCol),
      cents, queries, topK, subspaces, subDim, idCol, embCol)
  }

  /** Per-(vector, subspace) code rows (id, sub, cent_id, d2) against a
    * trained codebook — what an index BUILD persists. */
  def pqAssignments(emb: DataFrame, cents: DataFrame,
      subspaces: Int = 8, subDim: Int = 8,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    assign(pqSlices(emb, "id", col(idCol), subspaces, subDim, embCol), cents)
      .select(col("id"), col("sub"), col("cent_id"), col("d2"))

  /** Long code rows (id, sub, cent_id) → one WIDE row per vector
    * (id, c0..c<m-1>): the shape a stream-static ADC join wants, where
    * the per-neighbor distance is a projection over the m code columns
    * instead of an m-row aggregation (aggregations are stateful on
    * streams; projections are free). One map-side-combined shuffle. */
  def codesWide(codes: DataFrame, subspaces: Int = 8): DataFrame = {
    val aggs = (0 until subspaces).map(s =>
      max(when(col("sub") === s, col("cent_id"))).as(s"c$s"))
    codes.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** (id, cell) coarse-cell assignment against a trained coarse table —
    * the routing half an IVF index build persists next to its codes.
    * Zero-shuffle: the K centroids fold into the plan as literals. */
  def cellAssignments(emb: DataFrame, coarse: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    assignLit(emb.select(col(idCol).as("id"), quantize(col(embCol)).as("q")),
        collectCents(coarse))
      .select(col("id"), col("cent_id").as("cell"))

  /** (query_id, cell) probe pairs: each query's `nProbe` nearest coarse
    * cells by exact integer distance. Windowed top-n — the query set is
    * small by construction, so the funnel is per-query and tiny. */
  def probeCells(queries: DataFrame, coarse: DataFrame, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val qg = queries.select(col(idCol).as("query_id"),
      quantize(col(embCol)).as("q"))
    val scored = qg.crossJoin(broadcast(coarse))
      .select(col("query_id"), col("cent_id").as("cell"),
        dist2(col("q"), col("cq")).as("d2"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("cell"))
    scored.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nProbe).select(col("query_id"), col("cell"))
  }

  /** Query-side ADC distance table (query_id, sub, cent_id, dq): exact
    * integer dist2 from each query block to every codebook cell —
    * Q·m·k rows, broadcast-sized. */
  private def adcTable(queries: DataFrame, pqCents: DataFrame,
      subspaces: Int, subDim: Int, idCol: String, embCol: String): DataFrame =
    pqSlices(queries, "query_id", col(idCol), subspaces, subDim, embCol)
      .withColumnRenamed("cq", "qq") // pqSlices names non-"id" slices cq
      .join(pqCents, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cent_id"),
        dist2(col("qq"), col("cq")).as("dq"))

  /** ADC top-k over code rows + supplied probes — the shared search
    * kernel behind [[ivfPqSearchFrom]] (which computes probes itself)
    * and [[graft.ext.PqIndex.searchIvf]] (which also collects the probed
    * cells to prune the codes SCAN to their files). */
  private[graft] def adcOverProbed(codes: DataFrame, probes: DataFrame,
      pqCents: DataFrame, queries: DataFrame, topK: Int,
      subspaces: Int, subDim: Int, idCol: String, embCol: String): DataFrame = {
    val dtab = adcTable(queries, pqCents, subspaces, subDim, idCol, embCol)
    val scored = codes
      .select(col("id").as("neighbor_id"), col("cell"), col("sub"),
        col("cent_id"))
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(dtab), Seq("query_id", "sub", "cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dq")).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("adc"),
        col("rn").cast("long").as("rank"))
  }

  /** IVF-PQ search over PRE-BUILT state — code rows already carrying
    * their coarse `cell` (id, sub, cent_id, cell), the trained coarse
    * table, and the PQ codebook. [[ivfPqTopK]] is build + this; a
    * persisted index ([[graft.ext.PqIndex.searchIvf]]) drives the same
    * kernel, so the two are hash-identical by construction. */
  def ivfPqSearchFrom(codes: DataFrame, coarse: DataFrame,
      pqCents: DataFrame, queries: DataFrame, topK: Int, nProbe: Int = 2,
      subspaces: Int = 8, subDim: Int = 8,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    adcOverProbed(codes, probeCells(queries, coarse, nProbe, idCol, embCol),
      pqCents, queries, topK, subspaces, subDim, idCol, embCol)

  /** IVF-PQ: the standard large-scale ANN serving shape (FAISS's IVFPQ,
    * minus residual encoding — documented simplification; residuals
    * sharpen cells but need no new plan shapes). A coarse quantizer
    * routes, PQ codes score: queries probe their `nProbe` nearest coarse
    * cells by exact integer distance, and ADC runs ONLY over the probed
    * cells' code rows — cost per query ≈ |corpus|·nProbe/coarseK code
    * lookups, never a full scan.
    *
    * Build side (once per corpus): one coarse fit + one PQ fit + one
    * id-keyed join attaching each vector's cell to its codes — the only
    * corpus×corpus shuffle, amortized across every search after (persist
    * it via [[PqIndex]]-style tables in production). Search side: probes
    * and distance tables are Q-sized and broadcast; ADC sums are
    * map-side combined. Everything integer → deterministic, oracle-
    * checkable end-to-end. */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, topK: Int,
      coarseK: Int = 8, nProbe: Int = 2, subspaces: Int = 8,
      subDim: Int = 8, pqK: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val (coarse, pqCents, codes) =
      ivfPqBuild(emb, coarseK, subspaces, subDim, pqK, iters, idCol, embCol)
    ivfPqSearchFrom(codes, coarse, pqCents, queries, topK, nProbe,
      subspaces, subDim, idCol, embCol)
  }

  /** The build half of [[ivfPqTopK]]: (coarse table, PQ codebook, code
    * rows carrying their coarse cell) — exactly the three tables a
    * persisted index stores ([[graft.ext.PqIndex.buildIvf]]). The
    * codes⋈cells id-keyed join is the one corpus-sized shuffle. */
  def ivfPqBuild(emb: DataFrame, coarseK: Int = 8, subspaces: Int = 8,
      subDim: Int = 8, pqK: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding")
      : (DataFrame, DataFrame, DataFrame) = {
    val coarse = fit(emb, coarseK, iters, 1, idCol, embCol)
    val pqCents = pqFit(emb, subspaces, subDim, pqK, iters, idCol, embCol)
    val codes = pqAssignments(emb, pqCents, subspaces, subDim, idCol, embCol)
      .join(cellAssignments(emb, coarse, idCol, embCol), Seq("id"))
      .select(col("id"), col("cell"), col("sub"), col("cent_id"))
    (coarse, pqCents, codes)
  }

  /** Residual IVF-PQ — the full FAISS-IVFPQ shape: the PQ codebook
    * quantizes RESIDUALS v − c(cell) instead of raw vectors, so all k
    * cells share one codebook tuned to the (much tighter) within-cell
    * distribution — better recall at the same code budget than
    * [[ivfPqTopK]]. Residuals live on the same integer lattice
    * (componentwise long subtraction, exact), so the whole chain stays
    * hash-reproducible.
    *
    * The one structural difference from plain IVF-PQ: the query-side
    * distance table is keyed per (query, PROBED CELL) — the query's
    * residual differs per cell — so it holds Q·nProbe·m·k rows, still
    * broadcast-sized. Build cost and search shuffle shape are otherwise
    * identical to [[ivfPqTopK]]. */
  def ivfPqResidualTopK(emb: DataFrame, queries: DataFrame, topK: Int,
      coarseK: Int = 8, nProbe: Int = 2, subspaces: Int = 8,
      subDim: Int = 8, pqK: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val (coarse, pqCents, codes) = ivfPqResidualBuild(
      emb, coarseK, subspaces, subDim, pqK, iters, idCol, embCol)
    ivfPqResidualSearchFrom(codes, coarse, pqCents, queries, topK, nProbe,
      subspaces, subDim, idCol, embCol)
  }

  /** Build half of [[ivfPqResidualTopK]]: (coarse table, residual PQ
    * codebook, code rows carrying their cell) — persistable exactly like
    * the plain [[ivfPqBuild]] triple (the codebook just lives on the
    * residual lattice). */
  def ivfPqResidualBuild(emb: DataFrame, coarseK: Int = 8,
      subspaces: Int = 8, subDim: Int = 8, pqK: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding")
      : (DataFrame, DataFrame, DataFrame) = {
    val coarse = fit(emb, coarseK, iters, 1, idCol, embCol)
    val eFull = emb.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
    val assigned = assignLit(eFull, collectCents(coarse))
      .select(col("id"), col("q"), col("cent_id").as("cell"))
    // exact lattice residuals r = q − c(cell)
    val resid = assigned
      .join(broadcast(coarse.select(col("cent_id").as("cell"), col("cq"))),
        Seq("cell"))
      .select(col("id"), col("cell"),
        zip_with(col("q"), col("cq"), _ - _).as("rf"))
      // one corpus-sized table feeding seed-take, every sweep, and the
      // final encode — pin it once (same rationale as sweeps())
      .localCheckpoint(true)
    val eRes = latticeSlices(resid, Seq("id"), "rf", subspaces, subDim, "q")
    val seeds = latticeSlices(
      resid.orderBy(Hashing.hexInt(col("id").cast("string")), col("id"))
        .limit(pqK).withColumnRenamed("id", "cent_id"),
      Seq("cent_id"), "rf", subspaces, subDim, "cq")
    val pqCents = sweeps(eRes, seeds, iters)
    val codes = assign(eRes, pqCents)
      .select(col("id"), col("sub"), col("cent_id"))
      .join(resid.select(col("id"), col("cell")), Seq("id"))
      .select(col("id"), col("cell"), col("sub"), col("cent_id"))
    (coarse, pqCents, codes)
  }

  /** Residual-IVF-PQ search over pre-built state. One structural
    * difference from [[ivfPqSearchFrom]]: the query-side distance table
    * is keyed per (query, PROBED CELL) — the query's residual differs per
    * cell — so the dtab join on (cell, sub, cent_id) subsumes the probe
    * filter. Q·nProbe·m·k rows, still broadcast-sized. */
  def ivfPqResidualSearchFrom(codes: DataFrame, coarse: DataFrame,
      pqCents: DataFrame, queries: DataFrame, topK: Int, nProbe: Int = 2,
      subspaces: Int = 8, subDim: Int = 8,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    residualAdcOverProbes(codes,
      residualProbes(queries, coarse, nProbe, idCol, embCol),
      pqCents, topK, subspaces, subDim)

  /** Residual-ADC kernel over supplied probe rows — shared by
    * [[ivfPqResidualSearchFrom]] and [[graft.ext.PqIndex.searchIvfResidual]]
    * (which pins the probes to also prune the codes scan). */
  private[graft] def residualAdcOverProbes(codes: DataFrame,
      probes: DataFrame, pqCents: DataFrame, topK: Int,
      subspaces: Int, subDim: Int): DataFrame = {
    val dtab = latticeSlices(probes, Seq("query_id", "cell"), "rqf",
        subspaces, subDim, "rq")
      .join(pqCents, Seq("sub"))
      .select(col("query_id"), col("cell"), col("sub"), col("cent_id"),
        dist2(col("rq"), col("cq")).as("dq"))
    val scored = codes
      .select(col("id").as("neighbor_id"), col("cell"), col("sub"),
        col("cent_id"))
      .join(broadcast(dtab), Seq("cell", "sub", "cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dq")).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("adc"),
        col("rn").cast("long").as("rank"))
  }

  /** (query_id, cell, rqf) probe rows with the query's per-cell lattice
    * residual — the residual-path twin of [[probeCells]]. */
  private[graft] def residualProbes(queries: DataFrame, coarse: DataFrame,
      nProbe: Int, idCol: String, embCol: String): DataFrame = {
    val qg = queries.select(col(idCol).as("query_id"),
      quantize(col(embCol)).as("q"))
    val probeScored = qg.crossJoin(broadcast(coarse))
      .select(col("query_id"), col("cent_id").as("cell"),
        dist2(col("q"), col("cq")).as("d2"),
        zip_with(col("q"), col("cq"), _ - _).as("rqf"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("cell"))
    probeScored.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cell"), col("rqf"))
  }

  /** ADC search over PRE-BUILT code rows + codebook — the search half of
    * a persisted PQ index ([[graft.ext.PqIndex]]). Identical results to
    * [[pqTopK]] on the same corpus: the index is deterministic state, so
    * build-once/search-many and recompute-per-query are interchangeable. */
  def pqSearchFrom(codes: DataFrame, cents: DataFrame, queries: DataFrame,
      topK: Int, subspaces: Int = 8, subDim: Int = 8,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val dtab = pqSlices(queries, "query_id", col(idCol), subspaces, subDim,
        embCol)
      .withColumnRenamed("cq", "qq") // pqSlices names non-"id" slices cq
      .join(cents, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cent_id"),
        dist2(col("qq"), col("cq")).as("dq"))
    val scored = codes
      .select(col("id").as("neighbor_id"), col("sub"), col("cent_id"))
      .join(broadcast(dtab), Seq("sub", "cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dq")).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("adc"),
        col("rn").cast("long").as("rank"))
  }
}
