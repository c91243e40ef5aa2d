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

  /** Element sums in array order — deterministic, double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

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

  val numPlanes = 8

  /** LSH bucket id: bit p set iff dot(v, plane_p) > 0. */
  def signBucket(emb: Column): Column = {
    val planes = (0 until numPlanes).map { p =>
      // dot with the ±1 plane: sum_j emb[j] * sign(p, j)
      val signedSum = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, j) => x * when(
            Hashing.hexInt(concat(lit(p.toString), lit(","), j.cast("string"))) % 2 === 0,
            lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(signedSum > 0, lit(1L << p)).otherwise(lit(0L))
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
