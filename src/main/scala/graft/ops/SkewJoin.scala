package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SCALE.md; SURVEY §4 "Spill / skew").
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * plan-level tool for the pathological case it can't fix — a single hot
  * key whose rows exceed one executor's memory even after splitting, in a
  * non-broadcastable join.
  *
  * Mechanics: the skewed (large) side gets a random salt in [0, n); the
  * other side is replicated n× with every salt value (explode of a
  * constant array — a Generator, no shuffle of its own). The join key
  * becomes (key, salt), spreading each hot key over n reducer partitions.
  * Row multiplicity is preserved exactly; only placement changes.
  *
  * The salt uses a hash of the whole skewed row (xxhash64 over all
  * columns), not rand(): deterministic under task retries, which keeps
  * the join idempotent on a cluster.
  */
object SkewJoin {

  /** Inner equi-join `skewed ⋈ other` on `keys`, salted `factor` ways. */
  def saltedInnerJoin(skewed: DataFrame, other: DataFrame,
      keys: Seq[String], factor: Int = 8): DataFrame = {
    require(factor > 0)
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(factor)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
