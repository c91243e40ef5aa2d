package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed catalog tables: the co-located-join path (SCALE.md).
  *
  * Two tables bucketed by the same key into the same bucket count join
  * WITHOUT an Exchange on either side — at 100 TB that removes the
  * dominant cost of repeated fact-fact joins (e.g. the SCD2 target
  * re-joined on natural keys every batch). Bucketing lives in the catalog
  * (`saveAsTable`), unlike the path-based [[TableStore]]; both are thin
  * layers over the same parquet files.
  */
object BucketedStore {

  /** Write `df` as a bucketed (and bucket-sorted) catalog table. */
  def saveBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Path-anchored variant (EXTERNAL table) for per-call scratch
    * layouts: data lands under `path`, not the session warehouse, so a
    * killed run leaves only temp-dir garbage. Pre-partitions on the
    * bucket columns (Spark's bucket id and HashPartitioning share the
    * same Murmur3-pmod), so each bucket lands in ONE file — the layout
    * the sorted-bucket-scan path requires. */
  def saveBucketedExternal(df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], numBuckets: Int = 32): Unit =
    df.repartition(numBuckets,
        bucketCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", path)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
