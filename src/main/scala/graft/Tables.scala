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
    // events.parquet `ts` has shipped in two shapes across testdata
    // generations: TIMESTAMP(NANOS) (rounds 1-7 — Spark has no nanosecond
    // timestamp, so read the raw int64 under the legacy conf and floor to
    // microseconds; integer division, doubles would lose precision at
    // 1.7e18 ns) and, since the Aug 13 regen, a type Spark 4 reads
    // natively as TIMESTAMP_NTZ. Handle both by dispatching on the
    // resolved read schema; either way the column leaves here as a
    // session-UTC TimestampType at microsecond precision, so every
    // downstream query sees one stable shape.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // naive micros -> TimestampType; session tz is pinned UTC in
          // every entrypoint, so the cast is an identity on the value
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Convenience: load + register all tables as temp views so the same
    * query text works via spark.sql. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
