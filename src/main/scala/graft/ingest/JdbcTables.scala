package graft.ingest

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC ingestion/egress — the reference's Oracle-over-JDBC path
  * (`dbconnect.py`, `STG_Firebase2Oracle.py:65-96`: cx_Oracle cursor
  * inserts and SELECTs) re-expressed as Spark's JDBC data source.
  *
  * Scale design: a naive `spark.read.jdbc(url, table)` is a SINGLE
  * partition — one executor drags the whole table through one connection.
  * [[readPartitioned]] splits the read into `numPartitions` range-bounded
  * queries on a numeric column, so a 1000-executor cluster opens 1000
  * cursors against the RDBMS in parallel (bounded by the DB, not Spark).
  * Filters and projections push into the generated SQL (`PushedFilters`
  * on the JDBCRelation scan), so the database does the pruning — at
  * 100 TB the RDBMS side is the bottleneck either way; the engine's job
  * is to never funnel it through one connection.
  *
  * Tested against embedded Derby (the JDBC engine shipped in
  * /opt/spark/jars) — the code path is driver-agnostic.
  */
object JdbcTables {

  /** Single-partition read — the reference's literal behavior (one
    * cursor). Fine for dimension/config tables; use [[readPartitioned]]
    * for anything fact-sized. */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * connections, each scanning `partitionCol` stripes between the given
    * bounds. Bounds are caller-supplied (e.g. from a cheap
    * `SELECT min(k), max(k)` — one metadata query, never a data scan). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** Append rows over JDBC — the reference's executemany INSERT
    * (`STG_Firebase2Oracle.py:84-96`). Each Spark partition opens one
    * connection and batches inserts (`batchsize` option), so write
    * parallelism follows the DataFrame's partitioning. */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append,
      props: Properties = new Properties): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
