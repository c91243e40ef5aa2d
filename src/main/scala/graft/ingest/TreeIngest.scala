package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Nested-tree ingestion (reference S1/S2/P1/F13,
  * STG_Firebase2Oracle.py:43-61 + Airflow-DAG.py:283-297).
  *
  * The reference fetches the ENTIRE Firebase subtree into driver memory
  * and filters client-side — its stated weakness (SURVEY §4). Here the
  * tree is a distributed read: `spark.read.json` with an explicit 2-level
  * MapType schema, flattened by two `explode`s (Generators, pipelined in
  * one stage — no shuffle), with the timestamp threshold pushed into the
  * scan where the source format allows.
  */
object TreeIngest {

  /** Read a raw `{date: {time: record}}` JSON export (one tree per file,
    * exactly the shape `db.reference(...).get()` returns) into a single
    * `root` map column. Top-level Spark schemas must be structs, so the
    * map is parsed with `from_json` over whole-file text. */
  def readTree(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .select(from_json(col("value"), Schemas.firebaseTree).as("root"))

  /** Flatten date→time→record into one row per reading (S2): two map
    * explodes; date/time keys are carried for lineage but the record's
    * own Timestamp field is authoritative, as in the reference. */
  def flatten(tree: DataFrame): DataFrame =
    tree
      .select(explode(col("root")).as(Seq("date_key", "times")))
      .select(col("date_key"), explode(col("times")).as(Seq("time_key", "rec")))
      .select(col("date_key"), col("time_key"), col("rec.*"))

  /** Landing projection with the reference's defaulting quirks (F12/F13):
    *  - missing payload fields land as the literal 'N/A'
    *    (STG_Firebase2Oracle.py:80-83);
    *  - the threshold filter parses Timestamp, defaulting MISSING
    *    timestamps to epoch so they pass any threshold ≤ now (:57);
    *  - boundary records (ts == prevRunStart) re-ingest every run (>=,
    *    :58) and later absorb as SCD2 'NC' (SURVEY ST2/ST3).
    */
  def toLanding(flat: DataFrame, deviceId: String, prevRunStart: Timestamp): DataFrame = {
    val parsedTs = to_timestamp(col("Timestamp"), "yyyy-MM-dd HH:mm:ss")
    flat
      .filter(coalesce(parsedTs, lit(Schemas.epoch)) >= lit(prevRunStart))
      .select(
        coalesce(col("TimeZone"), lit("N/A")).as("timezone"),
        coalesce(col("Humidity"), lit("N/A")).as("humidity"),
        coalesce(col("Temperature"), lit("N/A")).as("temperature"),
        // missing Timestamp lands as null timestamp (the reference lands
        // the string 'N/A' into a DATE bind — an error path in practice;
        // we land SQL NULL, the nearest well-typed equivalent)
        parsedTs.as("timestamp"),
        lit(deviceId).as("deviceid"))
  }

  /** Firestore-style users collection scan (S3, get_user_data.py:10-30):
    * permissive schema defaults the 12 expected fields to null. */
  def readUsers(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.users).json(path)
}
