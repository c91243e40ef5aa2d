package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT>) — the ANN
  * surface of the training-data pipeline (north star).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact baseline. The query set broadcasts;
  *    the corpus streams through one whole-stage-codegen'd projection —
  *    at 100 TB this is a single scan, no shuffle until the final
  *    per-query top-k (TakeOrdered over k·|queries| rows).
  *  - LSH (random hyperplane sign) bucketing: sub-linear candidate
  *    generation; recall trades against bucket width. The hyperplanes are
  *    hash-derived constants, so both engines (and every executor)
  *    materialize identical planes with no side channel.
  */
object Similarity {

  /** Element sums in array order — deterministic, double precision.
    * Backed by the codegen'd [[graft.functions.DotProduct]]; IEEE-identical
    * to `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` but ~50× faster on
    * the pairwise paths (no interpreted lambda per element). */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayOps.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Rounded cosine dot/(na·nb) with an explicit NaN at zero norms.
    * IEEE 0/0 IS NaN, but ANSI Spark (the 4.x default) turns any /0
    * into a job-failing error — the guard restores the IEEE value, so a
    * degenerate zero-norm vector or centroid stays a deterministic
    * NaN that ranks FIRST under `cos DESC` in both Spark and DuckDB
    * (ADVICE r4) instead of killing the query. */
  def cosine(d: Column, na: Column, nb: Column): Column = {
    val p = na * nb
    round(when(p === 0.0, lit(Double.NaN)).otherwise(d / p), 6)
  }

  def toDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Brute-force cosine top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, cos) — ordering key is the ROUNDED
    * cosine with id tiebreak, so ranking is stable across engines. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("c_emb"))
      .withColumn("c_norm", norm(col("c_emb")))
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("q_emb"))
      .withColumn("q_norm", norm(col("q_emb")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(dot(col("c_emb"), col("q_emb")), col("c_norm"), col("q_norm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rn").cast("long").as("rank"))
  }

  /** Sign of (i,j): deterministic ±1 hyperplane component, shared with the
    * DuckDB oracle via the md5 parity trick. */
  def planeSign(plane: Int, j: Column): Column =
    when(Hashing.hexInt(concat(lit(plane.toString), lit(","), j.cast("string"))) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** Driver-side twin of [[planeSign]]: md5("p,j") first-8-hex parity.
    * Lets the hyperplanes be baked into the plan as literal arrays instead
    * of recomputing an md5 per (row, plane, element). */
  def planeSignValue(plane: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane,$j".getBytes("UTF-8"))
    val hex = md.take(4).map(b => f"${b & 0xff}%02x").mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  val numPlanes = 8

  /** Hyperplanes cover embeddings up to this dimension (dot truncates to
    * the embedding's length, so shorter vectors are free). */
  val maxDim = 256

  // typedlit → one constant ArrayData Literal per plane; an array(lit…)
  // of 256 elements would add 2048 CreateArray children to codegen.
  private def planeLit(p: Int): Column =
    typedlit((0 until maxDim).map(j => planeSignValue(p, j)))

  /** LSH bucket id: bit p set iff dot(v, plane_p) > 0. The planes are
    * constant ±1 literal arrays — the bucket costs 8 codegen'd dot
    * products per row, no hashing. */
  def signBucket(emb: Column): Column = {
    val planes = (0 until numPlanes).map { p =>
      when(dot(emb, planeLit(p)) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  /** Coarse-to-fine search through the JL projection: candidates come
    * from top-`poolSize` cosine in the PROJECTED space (dOut-dim dots —
    * 4× cheaper per comparison at 64→16), the final ranking from exact
    * full-dimension cosine over candidates only. The standard two-stage
    * retrieve→re-rank: the corpus-sized stage runs on compressed
    * vectors, the exact stage touches poolSize·|queries| rows. Recall
    * is bounded by the projection (measured in SimilaritySpec); results
    * are a subset of the projected pool re-ranked exactly. */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dOut: Int = 16, poolSize: Int = 20): DataFrame = {
    // wide-form projection: stays a pure per-row projection (the
    // long-form randomProject + regroup would cost a corpus shuffle)
    def proj(df: DataFrame): DataFrame = {
      val v = toDouble(col("embedding"))
      df.select(col("vec_id"),
        array((0 until dOut).map(p => round(dot(v, planeLit(p)), 6)): _*)
          .as("embedding"))
    }
    val pool = bruteForceTopK(proj(corpus), proj(queries), poolSize)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("ce"))
      .withColumn("cn", norm(col("ce")))
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("qe"))
      .withColumn("qn", norm(col("qe")))
    val exact = pool.join(c, "neighbor_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(dot(col("ce"), col("qe")), col("cn"), col("qn")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    exact.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rn").cast("long").as("rank"))
  }

  /** Maximal-marginal-relevance (Carbonell & Goldstein 1998) diversified
    * top-k: greedily pick candidates maximizing
    * λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) — relevance traded against
    * redundancy with what's already picked. For training-data curation
    * this is the retrieval that does NOT return five near-duplicates of
    * the best hit.
    *
    * Two distributed stages + one per-group fold: (1) candidate pool =
    * exact top-`poolSize` per query ([[bruteForceTopK]] — corpus scan,
    * broadcast queries); (2) pairwise candidate cosines WITHIN each pool
    * (pool² per query, pool ≪ corpus — never corpus²); (3) the greedy
    * selection itself runs per query group over arrays, k unrolled
    * argmax folds inside one codegen projection — groups are
    * independent, so a million queries parallelize while each selection
    * stays the sequential algorithm MMR requires. Determinism: rounded
    * 6-dp cosines, ties pick the smallest candidate id (the fold scans
    * candidates in id order and replaces only on strictly-better).
    * Empty selection contributes redundancy 0 (first pick = λ·rel). */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      poolSize: Int = 20, lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need 1 <= k <= poolSize, got $k/$poolSize")
    val pool = bruteForceTopK(corpus, queries, poolSize)
      .select(col("query_id"), col("neighbor_id").as("cand_id"),
        col("cos").as("rel"))
    val e = corpus.select(col("vec_id").as("cand_id"),
      toDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
    val pe = pool.join(e, "cand_id")
    // both directions + self pairs (self is never picked twice, but the
    // lookup must be total: ANSI element_at errors on a missing key)
    val sims = pe.as("l").join(pe.as("r"), Seq("query_id"))
      .select(col("query_id"),
        col("l.cand_id").as("a"), col("r.cand_id").as("b"),
        cosine(dot(col("l.v"), col("r.v")),
          col("l.nv"), col("r.nv")).as("sim"))
    val cand = pool.groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(col("cand_id"), col("rel"))))
        .as("cand"))
    val sm = sims.groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(
        struct(concat_ws(":", col("a"), col("b")), col("sim")))).as("sm"))
    val base = cand.join(sm, "query_id")
    def pick(sel: Column): Column = aggregate(col("cand"),
      struct(lit(-1L).as("id"), lit(-1e18).as("score")),
      (acc, c) => {
        val cid = c.getField("cand_id")
        val already = exists(sel, s => s.getField("id") === cid)
        val msim = when(size(sel) === 0, lit(0.0)).otherwise(
          aggregate(sel, lit(-2.0), (m, s) => greatest(m,
            element_at(col("sm"),
              concat_ws(":", cid, s.getField("id"))))))
        val score = lit(lambda) * c.getField("rel") - lit(1 - lambda) * msim
        when(already, acc).otherwise(
          when(score > acc.getField("score"),
            struct(cid.as("id"), score.as("score"))).otherwise(acc))
      })
    val selInit = array().cast("array<struct<id:bigint,score:double>>")
    // one projection PER STEP, each referencing the previous selection as
    // a bound attribute: pick() uses its argument several times, and a
    // single folded expression would re-embed the whole prior selection
    // subtree at every use — exponential expression growth that stalls
    // analysis/codegen by k=5. CollapseProject keeps non-cheap
    // expressions un-inlined, so the chain stays linear and the steps
    // still fuse into one codegen stage.
    val folded = (1 to k).foldLeft(
      base.withColumn("sel0", selInit)) { (df, t) =>
      df.withColumn(s"sel$t",
        array_append(col(s"sel${t - 1}"), pick(col(s"sel${t - 1}"))))
    }
    folded.select(col("query_id"),
        posexplode(filter(col(s"sel$k"), p => p.getField("id") =!= -1L)))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col").getField("id").as("neighbor_id"),
        col("col").getField("score").as("score"))
  }

  /** Johnson–Lindenstrauss sign random projection: compress each
    * embedding to `dOut` components, component p = dot(v, plane_p) over
    * the SAME hash-derived ±1 hyperplanes [[signBucket]] thresholds —
    * sign-LSH is exactly the 1-bit quantization of this projection, so
    * the two share one plane family (and one oracle derivation). The JL
    * lemma bounds pairwise-distance distortion at dOut ≈ 8·ln(n)/ε², so
    * a 64→16 projection cuts every downstream dot product 4× while
    * keeping neighborhoods approximately intact — the standard
    * pre-compression in front of brute-force or IVF search.
    *
    * Output long-form (id, dim, value): scalar rows, engine-portable
    * (both engines format a shared double identically; array columns
    * would compare as engine-specific renderings). Values round to the
    * 6-dp grid — a binary double can never sit exactly ON a decimal
    * midpoint, so identical inputs round identically in both engines.
    *
    * Scale shape: pure projection — dOut codegen'd dot products against
    * constant literal arrays per row, zero shuffle, scan speed. */
  def randomProject(emb: DataFrame, dOut: Int = 16,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(dOut > 0 && dOut <= numPlanes * 32,
      s"dOut must be in 1..${numPlanes * 32}, got $dOut")
    val v = toDouble(col(embCol))
    val comps = (0 until dOut).map(p => round(dot(v, planeLit(p)), 6))
    emb.select(col(idCol), posexplode(array(comps: _*)))
      .select(col(idCol), col("pos").cast("long").as("dim"),
        col("col").as("value"))
  }

  /** ANN top-k: candidates share the full 8-bit sign bucket; exact cosine
    * + ranking within candidates. Recall < 1 by construction — pair this
    * with [[bruteForceTopK]] to measure it (see AnnRecallSpec). */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("c_emb"))
      .withColumn("c_norm", norm(col("c_emb")))
      .withColumn("bucket", signBucket(col("c_emb")))
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("q_emb"))
      .withColumn("q_norm", norm(col("q_emb")))
      .withColumn("bucket", signBucket(col("q_emb")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(dot(col("c_emb"), col("q_emb")), col("c_norm"), col("q_norm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rn").cast("long").as("rank"))
  }

  /** IVF (inverted-file) ANN: the coarse-quantizer scale path.
    *
    * Centroids are a FIXED-SIZE deterministic sample: the `numCentroids`
    * corpus vectors with the smallest md5-hash of their id (hash-order
    * top-K — a TakeOrdered, not a sort). K is independent of corpus size,
    * so the centroid broadcast is O(K·dim) whether the corpus is 500
    * vectors or 100 TB (k-means would sharpen the cells, but a hash
    * sample keeps the operator reproducible across engines with no
    * trained state). Every corpus vector is assigned to its nearest
    * centroid (one broadcast cross-score + per-vector argmin); each query
    * probes its `nProbe` nearest centroids and searches only those
    * inverted lists.
    *
    * At 100 TB: assignment is a single pass (|corpus| × K codegen'd dot
    * products, centroids broadcast); the per-query search touches
    * |corpus| · nProbe / K rows instead of |corpus|. The defaults fit the
    * small test corpus; a production corpus raises K (e.g. 4096) and
    * keeps nProbe/K small. Ranking uses the ROUNDED cosine with id
    * tiebreaks throughout, so results are deterministic and
    * oracle-checkable. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCentroids: Int = 32, nProbe: Int = 8): DataFrame = {
    val cents = corpus
      .select(col("vec_id").as("cent_id"), toDouble(col("embedding")).as("ct"))
      .withColumn("ct_norm", norm(col("ct")))
      .orderBy(Hashing.hexInt(col("cent_id").cast("string")), col("cent_id"))
      .limit(numCentroids)
    ivfTopKFrom(corpus, queries, k, cents, nProbe)
  }

  /** IVF flow over a SUPPLIED centroid table (cent_id, ct: array<double>,
    * ct_norm) — the seam [[KMeans.ivfTopK]] plugs trained centroids into.
    * Same plan as [[ivfTopK]]: broadcast centroids, one-pass assignment,
    * per-query probes, cell-local exact scoring. */
  def ivfTopKFrom(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: DataFrame, nProbe: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("c_emb"))
      .withColumn("c_norm", norm(col("c_emb")))
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("q_emb"))
      .withColumn("q_norm", norm(col("q_emb")))

    def nearestCents(side: DataFrame, idCol: String, emb: String,
        nrm: String, keep: Int): DataFrame = {
      val ccos = cosine(dot(col(emb), col("ct")), col(nrm), col("ct_norm"))
      if (keep == 1) {
        // corpus-side assignment: argmax as min(struct(-cos, cent_id))
        // under groupBy — the partial aggregate combines map-side, so the
        // shuffle carries ~|corpus| rows instead of |corpus|·K, with no
        // per-partition sort. Same (cos desc, cent_id) rule as the window.
        // NaN guard (ADVICE r4): a zero-norm vector or centroid makes the
        // cosine NaN; ORDER BY cos DESC ranks NaN FIRST in both Spark and
        // DuckDB, but -NaN is still NaN and ranks LAST under min(struct) —
        // so map NaN → -∞, which min-ranks first, and the aggregate argmin
        // agrees with the window path and the oracle even on degenerate
        // vectors (ties among NaNs fall to the cent_id tiebreak in both).
        side.crossJoin(broadcast(cents))
          .select(col(idCol), col(emb), col(nrm),
            struct(nanvl(negate(ccos), lit(Double.NegativeInfinity)).as("nc"),
              col("cent_id")).as("cc"))
          .groupBy(col(idCol), col(emb), col(nrm))
          .agg(min(col("cc")).as("cc"))
          .select(col(idCol), col(emb), col(nrm), col("cc.cent_id").as("cent_id"))
      } else {
        // query-side probes: keep-n per query; the query set is small by
        // construction, so the window funnel is per-query and tiny
        val scored = side.crossJoin(broadcast(cents))
          .select(col(idCol), col(emb), col(nrm), col("cent_id"), ccos.as("ccos"))
        val w = Window.partitionBy(col(idCol))
          .orderBy(col("ccos").desc, col("cent_id"))
        scored.withColumn("crn", row_number().over(w))
          .filter(col("crn") <= keep)
          .drop("ccos", "crn")
      }
    }

    val assigned = nearestCents(c, "neighbor_id", "c_emb", "c_norm", 1)
    val probes = nearestCents(q, "query_id", "q_emb", "q_norm", nProbe)
    // each neighbor lives in exactly one cell (keep=1) and probe cells are
    // distinct per query, so (query, neighbor) pairs are already unique
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(dot(col("c_emb"), col("q_emb")), col("c_norm"), col("q_norm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rn").cast("long").as("rank"))
  }

  /** Embedding-space near-duplicate pairs: all (a<b) with cosine ≥ thr.
    * Quadratic by construction — NOT registered as a query; kept only as
    * the recall oracle for [[cosineNearDupPairsBucketed]] (same role
    * ngram-Jaccard plays for MinHash). */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), toDouble(col("embedding")).as("ea"))
      .withColumn("na", norm(col("ea")))
    val b = emb.select(col("vec_id").as("id_b"), toDouble(col("embedding")).as("eb"))
      .withColumn("nb", norm(col("eb")))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(dot(col("ea"), col("eb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Symmetric int8 quantization report — the 4× memory lever for an ANN
    * index (float32 → int8 halves-twice the vectors a cache level holds;
    * IVF cell scans become SIMD byte ops on a real engine). Per vector:
    * scale = max |component|, code_i = ⌊v_i·127/scale⌋, and the
    * worst-dimension reconstruction error — the number that says whether
    * int8 is safe for the corpus at hand (bounded by scale/127).
    *
    * Engine-exact on purpose: float→double widening, the ·127 product,
    * the division, and ⌊·⌋ are all IEEE-identical in DuckDB (⌊·⌋ where a
    * production quantizer would round-to-nearest — rounding ties are
    * engine-dependent, the documented fixed-point discipline). Reported
    * doubles land on the 10⁻⁶ floor grid. Pure projection: zero shuffle,
    * scan speed at any corpus size. */
  def quantizeInt8Stats(emb: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val v = toDouble(col(embCol))
    val df = emb.select(col(idCol), v.as("v"))
      .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
    val code: Column => Column = x =>
      when(col("amax") > 0, floor(x * lit(127.0) / col("amax")).cast("long"))
        .otherwise(lit(0L))
    val recon: (Column, Column) => Column = (x, c) =>
      abs(x - c.cast("double") * col("amax") / lit(127.0))
    df.withColumn("codes", transform(col("v"), code))
      .select(col(idCol),
        floor(col("amax") * lit(1000000.0)).cast("long").as("amax_q6"),
        floor(array_max(zip_with(col("v"), col("codes"), recon)) *
          lit(1000000.0)).cast("long").as("err_q6"),
        aggregate(transform(col("codes"), c => abs(c)), lit(0L), _ + _)
          .as("code_l1"))
  }

  /** SQ8 cosine top-k: brute-force search over the int8 CODES instead of
    * the float vectors — the search path [[quantizeInt8Stats]]'s error
    * report certifies. Per-vector scales cancel out of the cosine
    * (cos(ŝa·ca, ŝb·cb) = Σca·cb / (‖ca‖·‖cb‖)), so scoring needs only
    * the exact int64 code dot (codegen'd
    * [[graft.functions.DotProductLong]]) and two norms — the corpus scan
    * reads a 4×-smaller column and does integer multiplies. Approximate
    * by quantization only; ranking uses the rounded cosine with id
    * tiebreak, deterministic cross-engine. Zero-norm codes (the zero
    * vector) drop — cosine is undefined there. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def codes(df: DataFrame, idAs: String, codeAs: String): DataFrame = {
      val v = toDouble(col("embedding"))
      val amax = array_max(transform(v, x => abs(x)))
      df.select(col("vec_id").as(idAs),
          transform(v, x => when(amax > 0,
            floor(x * lit(127.0) / amax).cast("long")).otherwise(lit(0L)))
            .as(codeAs))
        .withColumn(s"${codeAs}_n2",
          graft.functions.ArrayOps.dotProductLong(col(codeAs), col(codeAs)))
        .filter(col(s"${codeAs}_n2") > 0L)
    }
    val c = codes(corpus, "neighbor_id", "cc")
    val q = codes(queries, "query_id", "qc")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.ArrayOps.dotProductLong(col("cc"), col("qc"))
            .cast("double") /
          (sqrt(col("cc_n2").cast("double")) * sqrt(col("qc_n2").cast("double"))),
          6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rn").cast("long").as("rank"))
  }

  /** Near-dup banding: 8 bands × 8 planes (hyperplanes 0..63, band b owns
    * planes b·8..b·8+7). Unrelated vectors collide in a band w.p. ~2⁻⁸, so
    * candidate volume is ~bands/256 ≈ 3% of all pairs — near-linear at
    * corpus scale — while recall rises with similarity (≈0.93 at cos 0.9;
    * identical vectors always collide). More bands buy recall linearly in
    * candidate volume. */
  val neardupBands = 8
  val neardupPlanesPerBand = 8

  /** Band bucket: `planesPerBand` sign bits of band `band`'s hyperplanes,
    * packed little-endian. Same constant-folded plane literals as
    * [[signBucket]]. */
  def bandBucket(emb: Column, band: Int, planesPerBand: Int): Column =
    (0 until planesPerBand).map { j =>
      when(dot(emb, planeLit(band * planesPerBand + j)) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Scale path for embedding near-dup pairs: sign-LSH band buckets
    * generate candidates (equi-join on (band, bucket), never all-pairs),
    * then the exact rounded cosine verifies ≥ threshold. Output ⊆ the
    * exact [[cosineNearDupPairs]] with identical cosines; recall is the
    * banding collision probability (see NeardupRecallSpec). */
  def cosineNearDupPairsBucketed(emb: DataFrame, threshold: Double,
      bands: Int = neardupBands,
      planesPerBand: Int = neardupPlanesPerBand): DataFrame = {
    val v = emb.select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
    // self-join left AS the planner chooses (measured r18, same verdict
    // as Dedup.lshCandidates): at bench scale the broadcast plan
    // recomputes the banding on both sides but still beat both a
    // checkpoint (materialization barrier) and a SHUFFLE_HASH pin (two
    // shuffle stages vs one pipelined broadcast); at corpus scale the
    // band frame exceeds broadcast size and the planner's sort-merge
    // join reuses the two identical exchanges, computing banding once.
    val banded = v.select(col("id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), bandBucket(col("v"), b, planesPerBand).as("bh"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
    val cands = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val a = v.select(col("id").as("id_a"), col("v").as("va"), col("nv").as("na"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("nv").as("nb"))
    cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        cosine(dot(col("va"), col("vb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** k-center greedy coreset selection (Gonzalez 1985; the geometric
    * data-selection baseline — Sener & Savarese 2018 use exactly this
    * farthest-point traversal for active-learning coresets): pick the
    * smallest-id point as the seed, then k−1 times pick the point
    * FARTHEST from its nearest already-chosen center, and finally assign
    * every point to its nearest center.
    *
    * Output: one row per input vector — (vec_id, center_id, d2c) where
    * d2c is the squared L2 distance to the assigned center on the
    * round-6 lattice (the shared cross-engine float discipline; ties in
    * the per-round argmax break on smaller id, and an equal-distance
    * re-assignment keeps the EARLIER center, so the traversal is fully
    * deterministic).
    *
    * Scale shape: each of the k rounds is one whole-stage-codegen'd
    * projection against a BROADCAST center literal (O(dim) constants)
    * followed by a TakeOrdered(1) — never a pairwise join; total work is
    * O(k·N·dim) with k driver-side 1-row collects (the same sanctioned
    * per-round-collect shape as BPE merge selection). The running
    * min-distance column is locally checkpointed each round so lineage
    * stays constant in k (the Graph.hits lesson). */
  def kCenterGreedy(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k-center needs k >= 1, got $k")
    val pts = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
      .localCheckpoint(true)
    def vecLit(vs: Seq[Double]): Column = array(vs.map(lit): _*)
    def d2To(cv: Seq[Double], cn2: Double): Column =
      round(col("n2") + lit(cn2) - lit(2.0) * dot(col("v"), vecLit(cv)), 6)
    val seedRows = pts.orderBy(col("id")).limit(1).collect()
    if (seedRows.isEmpty) // empty corpus: empty assignment, not a crash
      return pts.select(col("id").as("vec_id"), col("id").as("center_id"),
        col("n2").as("d2c")).limit(0)
    val seed = seedRows(0)
    def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getSeq[Double](r.fieldIndex("v"))
    var centers = List(seed.getLong(0))
    var cur = pts
      .withColumn("md", d2To(vecOf(seed), seed.getDouble(2)))
      .withColumn("cid", lit(seed.getLong(0)))
      .localCheckpoint(true)
    for (_ <- 1 until k) {
      val next = cur.filter(!col("id").isin(centers: _*))
        .orderBy(col("md").desc, col("id")).limit(1).collect()(0)
      centers ::= next.getLong(0)
      val d2 = d2To(vecOf(next), next.getDouble(next.fieldIndex("n2")))
      cur = cur.select(col("id"), col("v"), col("n2"),
          when(d2 < col("md"), d2).otherwise(col("md")).as("md"),
          when(d2 < col("md"), lit(next.getLong(0))).otherwise(col("cid"))
            .as("cid"))
        .localCheckpoint(true)
    }
    cur.select(col("id").as("vec_id"), col("cid").as("center_id"),
      col("md").as("d2c"))
  }

  /** Per-class embedding centroid margins — the contrastive-data QA
    * readout: mean vector per label on the q6 integer lattice
    * (components floor to ⌊x·10⁶⌋ BEFORE summing, so the per-dimension
    * sums are exact longs and ORDER-INDEPENDENT — a float mean would
    * hash-flake under Spark's parallel reduction), then the pairwise
    * cosine between label centroids (rounded 6dp, NaN on a zero-norm
    * centroid). High inter-class centroid cosine = classes the embedding
    * space cannot separate — the slice to re-mine or re-label.
    *
    * Scale shape: one posexplode→groupBy(label, dim) pass (map-side
    * combinable into |labels|·dim cells), then an O(labels²) broadcast
    * self-join over centroid rows — never a row-level pairwise term.
    * Mean, not sum, enters the cosine so per-dim magnitudes stay ≤ 10⁶
    * and the int64 dot (≤ dim·10¹²) cannot wrap at any corpus size. */
  def classCentroidMargins(emb: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val q = emb.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("xq"))
    val cent = q.groupBy(col("label"), col("dim"))
      .agg(sum(col("xq")).as("sq"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        // exact floor division (pmod keeps it exact for negative sums)
        ((col("sq") - pmod(col("sq"), col("n"))) / col("n"))
          .cast("long").as("mq"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("mq")))),
        p => p.getField("mq")).as("c"))
      .localCheckpoint(true) // tiny (|labels| rows), reused by both sides
    val a = cent.select(col("label").as("label_a"), col("c").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("c").as("cb"))
    val d = graft.functions.ArrayOps.dotProductLong(col("ca"), col("cb"))
      .cast("double")
    val na = graft.functions.ArrayOps.dotProductLong(col("ca"), col("ca"))
      .cast("double")
    val nb = graft.functions.ArrayOps.dotProductLong(col("cb"), col("cb"))
      .cast("double")
    a.crossJoin(broadcast(b)).filter(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        cosine(d, sqrt(na), sqrt(nb)).as("cos"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019): for every
    * source-language document, the best other-language candidate scored
    * by the RATIO margin — cosine divided by the mean of both sides'
    * k-NN cosines — which suppresses hub vectors that score high against
    * everything (raw cosine's classic failure on this task). A pair is
    * mined when the margin exceeds 1.
    *
    * Exact integer lattice: cosines land on the 6dp grid as ppm longs
    * (cos6), the k-NN means stay SUMS (sx, sy — exact integer addition;
    * a float mean of even 4 doubles is addition-order-dependent), and
    *   margin_ppm = ⌊10⁶ · 2k·cos6 / (sx + sy)⌋   (guarded for sx+sy ≤ 0)
    * so ranking and the mined flag are engine-exact. Ties break on id.
    *
    * Scale shape: the SOURCE side broadcasts (the shard being mined —
    * bounded by construction, like the anchor sets everywhere else in
    * this module); the target corpus streams through one codegen scoring
    * pass, checkpointed and reused by both k-NN windows (per-src and
    * per-tgt partitions of the |tgt|·|src| candidate stream) and the
    * final margin argmax. Corpus×corpus mining composes the LSH-banded
    * candidate generator (cosineNearDupPairsBucketed) in front. */
  def bitextMine(docs: DataFrame, emb: DataFrame, srcLang: String,
      k: Int = 4, idCol: String = "doc_id",
      vecIdCol: String = "vec_id"): DataFrame = {
    val lv = docs.select(col(idCol).as("id"), col("lang"))
      .join(emb.select(col(vecIdCol).as("id"),
        toDouble(col("embedding")).as("v")), Seq("id"))
      .withColumn("nv", norm(col("v")))
    val src = lv.filter(col("lang") === srcLang)
      .select(col("id").as("src_id"), col("v").as("sv"), col("nv").as("sn"))
    val tgt = lv.filter(col("lang") =!= srcLang)
      .select(col("id").as("tgt_id"), col("v").as("tv"), col("nv").as("tn"))
    val c = cosine(dot(col("tv"), col("sv")), col("tn"), col("sn"))
    // Reused by both k-NN windows and the argmax but deliberately NOT
    // checkpointed: the candidate stream is O(|src|·|tgt|) — at 10× data
    // materializing it blew executor memory (measured: ScaleCheck OOM at
    // sf1), while recomputing it is three broadcast-join codegen scans.
    val scored = tgt.crossJoin(broadcast(src))
      .select(col("src_id"), col("tgt_id"),
        round(c * lit(1000000.0)).cast("long").as("cos6"))
    // k-NN sums as bounded top-k-sum AGGREGATES (r18, guide §2.3/§2.4):
    // the row_number windows this replaces each paid an exchange + full
    // per-partition sort of the |src|·|tgt| candidate stream; the sum of
    // a top-k-by-(cos6 desc, id) selection depends only on the multiset
    // of the k largest cos6 values (boundary ties sum identically
    // whichever id wins the rank), so the k-slot buffer is bit-identical
    // and partial-aggregates map-side.
    val ax = scored.groupBy(col("src_id"))
      .agg(graft.functions.TopKSumLong.topKSumLong(col("cos6"), k).as("sx"))
    val ay = scored.groupBy(col("tgt_id"))
      .agg(graft.functions.TopKSumLong.topKSumLong(col("cos6"), k).as("sy"))
    val den = col("sx") + col("sy")
    val num = lit(2L * k) * col("cos6") * lit(1000000L)
    val margins = scored
      .join(broadcast(ax), Seq("src_id"))
      .join(ay, Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("cos6"),
        when(den > 0L, ((num - pmod(num, den)) / den).cast("long"))
          .otherwise(lit(0L)).as("margin_ppm"))
    // per-src argmax as a struct-min aggregate, not a window (the
    // repo-wide argmax discipline): (−margin, tgt_id) lexicographic min
    // IS (margin desc, tgt_id asc), and tgt_id is unique per src so the
    // pick matches the old row_number rule exactly — one map-side
    // combined aggregate instead of a third sort of the stream.
    margins.groupBy(col("src_id"))
      .agg(min(struct((-col("margin_ppm")).as("nm"), col("tgt_id"),
        col("cos6"))).as("b"))
      .select(col("src_id"), col("b.tgt_id").as("tgt_id"),
        col("b.cos6").as("cos6"), (-col("b.nm")).as("margin_ppm"))
      .withColumn("is_parallel",
        (col("margin_ppm") > lit(1000000L)).cast("int").cast("long"))
  }

  /** Corpus×corpus bitext mining — the LSH-composed form the
    * [[bitextMine]] Scaladoc promises (VERDICT r15 closes the honest
    * bound): when BOTH sides are corpus-sized, the |src|·|tgt| candidate
    * stream is replaced by sign-LSH band candidates (the
    * [[cosineNearDupPairsBucketed]] generator, split src-vs-tgt so only
    * CROSS-language collisions surface), and the ratio margin runs over
    * candidates only.
    *
    * Semantics (candidate-restricted, deterministic): the k-NN sums sx,
    * sy are over each side's top-min(k, candidates) within the candidate
    * stream — the margin DEFINITION shifts with the prefilter, which is
    * exactly how banded margin mining behaves in production (a
    * non-candidate cannot contribute to a hub penalty it was never
    * scored against). Source docs with no band collision emit nothing
    * (nothing to mine). Same exact-integer lattice as [[bitextMine]]:
    * cos6 on the round-6 grid, margin_ppm by decimal floor division,
    * id tiebreaks everywhere.
    *
    * Scale shape: two band projections (pure codegen — constant plane
    * literals), one (band, bh) equi-join producing ~bands/2^planes of
    * the all-pairs volume, one exact-scoring join over candidates, and
    * the same per-side window aggregates — every exchange key-
    * partitioned, no crossJoin anywhere, neither side broadcasts. */
  def bitextMineLsh(docs: DataFrame, emb: DataFrame, srcLang: String,
      k: Int = 4, bands: Int = neardupBands,
      planesPerBand: Int = neardupPlanesPerBand, idCol: String = "doc_id",
      vecIdCol: String = "vec_id"): DataFrame = {
    // NOT checkpointed (ADVICE r16): lv is corpus-sized (every embedding
    // vector) — materializing it on executor storage is exactly what the
    // exact face and DSIR document avoiding; the docs⋈emb projection is
    // one cheap equi-join to recompute per consumer, and the frame worth
    // pinning is the candidate-sized `scored` below (which is).
    val lv = docs.select(col(idCol).as("id"), col("lang"))
      .join(emb.select(col(vecIdCol).as("id"),
        toDouble(col("embedding")).as("v")), Seq("id"))
      .withColumn("nv", norm(col("v")))
    def banded(side: DataFrame): DataFrame =
      side.select(col("id"), explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            bandBucket(col("v"), b, planesPerBand).as("bh"))
        }: _*)).as("bb"))
        .select(col("id"), col("bb.band"), col("bb.bh"))
    val src = lv.filter(col("lang") === srcLang)
    val tgt = lv.filter(col("lang") =!= srcLang)
    val cands = banded(src).as("l").join(banded(tgt).as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh"))
      .select(col("l.id").as("src_id"), col("r.id").as("tgt_id"))
      .distinct()
    val c = cosine(dot(col("tv"), col("sv")), col("tn"), col("sn"))
    val scored = cands
      .join(src.select(col("id").as("src_id"), col("v").as("sv"),
        col("nv").as("sn")), Seq("src_id"))
      .join(tgt.select(col("id").as("tgt_id"), col("v").as("tv"),
        col("nv").as("tn")), Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"),
        round(c * lit(1000000.0)).cast("long").as("cos6"))
      .localCheckpoint(true) // candidate-sized (not |src|·|tgt|): safe to
                             // pin, read by both k-NN sums + the argmax
    // same top-k-sum aggregate + struct-min argmax rewrite as
    // [[bitextMine]] (r18): the three row_number windows this replaces
    // each sorted the candidate stream; the aggregates are bit-identical
    // (see bitextMine) and partial-aggregate map-side.
    val ax = scored.groupBy(col("src_id"))
      .agg(graft.functions.TopKSumLong.topKSumLong(col("cos6"), k).as("sx"))
    val ay = scored.groupBy(col("tgt_id"))
      .agg(graft.functions.TopKSumLong.topKSumLong(col("cos6"), k).as("sy"))
    val den = col("sx") + col("sy")
    val num = lit(2L * k) * col("cos6") * lit(1000000L)
    val margins = scored
      .join(ax, Seq("src_id"))
      .join(ay, Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("cos6"),
        when(den > 0L, ((num - pmod(num, den)) / den).cast("long"))
          .otherwise(lit(0L)).as("margin_ppm"))
    margins.groupBy(col("src_id"))
      .agg(min(struct((-col("margin_ppm")).as("nm"), col("tgt_id"),
        col("cos6"))).as("b"))
      .select(col("src_id"), col("b.tgt_id").as("tgt_id"),
        col("b.cos6").as("cos6"), (-col("b.nm")).as("margin_ppm"))
      .withColumn("is_parallel",
        (col("margin_ppm") > lit(1000000L)).cast("int").cast("long"))
  }

  /** Triplet mining for contrastive training (Schroff et al. 2015,
    * FaceNet): for each anchor, the best POSITIVE (same label, highest
    * cosine), the HARDEST negative (different label, highest cosine),
    * and the SEMI-HARD negative — the highest-cosine negative still
    * farther than the positive (cos < pos_cos), the band FaceNet found
    * trains stablest. Missing cases (no positive/negative/semi-hard)
    * surface as the sentinel (-1, -2.0) — an id below every vec_id and a
    * cosine below the [-1, 1] range — so the output stays dense and
    * hash-comparable.
    *
    * Scale shape: the anchor set BROADCASTS (it is the small,
    * per-training-step side); the corpus streams through one codegen
    * scoring projection, and every argmax is a row_number over
    * per-anchor partitions of the |anchors|·N candidate stream — the
    * bruteForceTopK discipline, no corpus×corpus term anywhere. Ranking
    * keys are the ROUNDED cosine with id tiebreak (cross-engine
    * stable). */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame): DataFrame = {
    val c = corpus.select(col("vec_id").as("cand_id"),
        col("label").as("cand_label"), toDouble(col("embedding")).as("ce"))
      .withColumn("cn", norm(col("ce")))
    val a = anchors.select(col("vec_id").as("anchor_id"),
        col("label").as("a_label"), toDouble(col("embedding")).as("ae"))
      .withColumn("an", norm(col("ae")))
    val scored = c.crossJoin(broadcast(a))
      .filter(col("cand_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("cand_id"),
        (col("cand_label") === col("a_label")).as("is_pos"),
        cosine(dot(col("ce"), col("ae")), col("cn"), col("an")).as("cos"))
      .localCheckpoint(true) // reused three times: pos, hard, semi-hard
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    def best(df: DataFrame, idName: String, cosName: String): DataFrame =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("anchor_id"), col("cand_id").as(idName),
          col("cos").as(cosName))
    val pos = best(scored.filter(col("is_pos")), "pos_id", "pos_cos")
    val neg = best(scored.filter(!col("is_pos")), "neg_id", "neg_cos")
    val semi = best(
      scored.filter(!col("is_pos"))
        .join(broadcast(pos), Seq("anchor_id"))
        .filter(col("cos") < col("pos_cos"))
        .select(col("anchor_id"), col("cand_id"), col("cos")),
      "semi_id", "semi_cos")
    anchors.select(col("vec_id").as("anchor_id"))
      .join(broadcast(pos), Seq("anchor_id"), "left")
      .join(broadcast(neg), Seq("anchor_id"), "left")
      .join(broadcast(semi), Seq("anchor_id"), "left")
      .select(col("anchor_id"),
        coalesce(col("pos_id"), lit(-1L)).as("pos_id"),
        coalesce(col("pos_cos"), lit(-2.0)).as("pos_cos"),
        coalesce(col("neg_id"), lit(-1L)).as("neg_id"),
        coalesce(col("neg_cos"), lit(-2.0)).as("neg_cos"),
        coalesce(col("semi_id"), lit(-1L)).as("semi_id"),
        coalesce(col("semi_cos"), lit(-2.0)).as("semi_cos"))
  }
}
