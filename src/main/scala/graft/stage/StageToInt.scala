package graft.stage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Landing → intermediate copy (reference S6, STG_to_INT.py:16-20):
  * `INSERT INTO int SELECT *, :load_key FROM landing WHERE deviceid=:d`
  * becomes a set-oriented append with a literal column. Catalyst folds
  * the constant; the deviceid filter pushes into the parquet scan.
  */
object StageToInt {
  def apply(landing: DataFrame, loadKey: Long, deviceId: String): DataFrame =
    landing
      .filter(col("deviceid") === deviceId)
      .withColumn("load_key", lit(loadKey))
}
