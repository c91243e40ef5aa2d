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
        round(dot(col("c_emb"), col("q_emb")) / (col("c_norm") * col("q_norm")), 6).as("cos"))
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
        round(dot(col("c_emb"), col("q_emb")) / (col("c_norm") * col("q_norm")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rn").cast("long").as("rank"))
  }

  /** IVF (inverted-file) ANN: the coarse-quantizer scale path.
    *
    * Centroids are a deterministic subsample (`vec_id % centroidEvery == 0`
    * — k-means would sharpen the cells, but a fixed subsample keeps the
    * operator reproducible across engines with no trained state). Every
    * corpus vector is assigned to its nearest centroid (one broadcast
    * cross-score + per-vector argmin); each query probes its `nProbe`
    * nearest centroids and searches only those inverted lists.
    *
    * At 100 TB: assignment is a single pass (|corpus| × |centroids|
    * codegen'd dot products, centroids broadcast); the per-query search
    * touches |corpus| · nProbe / |centroids| rows instead of |corpus|.
    * Ranking uses the ROUNDED cosine with id tiebreaks throughout, so
    * results are deterministic and oracle-checkable. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroidEvery: Int = 50, nProbe: Int = 4): DataFrame = {
    val cents = corpus.filter(col("vec_id") % centroidEvery === 0)
      .select(col("vec_id").as("cent_id"), toDouble(col("embedding")).as("ct"))
      .withColumn("ct_norm", norm(col("ct")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("c_emb"))
      .withColumn("c_norm", norm(col("c_emb")))
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("q_emb"))
      .withColumn("q_norm", norm(col("q_emb")))

    def nearestCents(side: DataFrame, idCol: String, emb: String,
        nrm: String, keep: Int): DataFrame = {
      val scored = side.crossJoin(broadcast(cents))
        .select(col(idCol), col(emb), col(nrm), col("cent_id"),
          round(dot(col(emb), col("ct")) / (col(nrm) * col("ct_norm")), 6).as("ccos"))
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("ccos").desc, col("cent_id"))
      scored.withColumn("crn", row_number().over(w))
        .filter(col("crn") <= keep)
        .drop("ccos", "crn")
    }

    val assigned = nearestCents(c, "neighbor_id", "c_emb", "c_norm", 1)
    val probes = nearestCents(q, "query_id", "q_emb", "q_norm", nProbe)
    // each neighbor lives in exactly one cell (keep=1) and probe cells are
    // distinct per query, so (query, neighbor) pairs are already unique
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("c_emb"), col("q_emb")) / (col("c_norm") * col("q_norm")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rn").cast("long").as("rank"))
  }

  /** Embedding-space near-duplicate pairs: all (a<b) with cosine ≥ thr.
    * Quadratic — production path buckets first (see annTopK); kept exact
    * here as the dedup-quality oracle. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), toDouble(col("embedding")).as("ea"))
      .withColumn("na", norm(col("ea")))
    val b = emb.select(col("vec_id").as("id_b"), toDouble(col("embedding")).as("eb"))
      .withColumn("nb", norm(col("eb")))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
