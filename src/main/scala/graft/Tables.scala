package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated star-schema tables (TESTDATA.md) from a
  * scale-factor directory. One parquet file per table.
  *
  * At 100 TB these would be multi-file partitioned datasets; `spark.read
  * .parquet(dir)` handles both shapes identically, and Catalyst pushes
  * filters/projections into the scan either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS): Spark has no nanosecond
    // timestamp type, so read the raw int64 and floor to microseconds
    // (integer division — doubles would lose precision at 1.7e18 ns).
    // Engine queries only rely on ≥second granularity of `ts`.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Convenience: load + register all tables as temp views so the same
    * query text works via spark.sql. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
