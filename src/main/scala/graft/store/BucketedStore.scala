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

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
