package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment join (point ∈ [start, end]) via time binning.
  *
  * A raw inequality join has no equi-key, so Spark plans a nested-loop
  * product — unusable at scale. Binning restores an equi-key: points key
  * by (keys, floor(ts / bin)); intervals explode to every bin they span;
  * the equi-join on the bin prunes to near-candidates and a cheap
  * `between` refine removes false positives. Replication factor =
  * avg interval length / bin width — pick binMs near the typical
  * interval length so intervals land in O(1) bins.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startCol: String, endCol: String,
      binMs: Long): DataFrame = {
    val binUs = binMs * 1000L
    val p = points.withColumn("__bin",
      floor(unix_micros(col(pointTs)) / binUs).cast("long"))
    val i = intervals.withColumn("__bin", explode(sequence(
      floor(unix_micros(col(startCol)) / binUs).cast("long"),
      floor(unix_micros(col(endCol)) / binUs).cast("long"))))
    p.join(i, (keys :+ "__bin").toSeq)
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bin")
  }
}
