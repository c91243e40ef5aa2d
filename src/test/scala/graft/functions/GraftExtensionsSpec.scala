package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate through spark.sql") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 32.0)
    val sh = spark.sql(
      "SELECT graft_simhash32(array(CAST(5 AS BIGINT), CAST(5 AS BIGINT))) AS f")
      .collect()(0).getLong(0)
    assert(sh === 5L) // unanimous votes reproduce the single hash's bits
    // null propagation matches the higher-order-function forms
    assert(spark.sql("SELECT graft_dot(NULL, array(1.0D)) AS d").collect()(0).isNullAt(0))
    // bloom probe: build a filter over xxhash64 values, probe through SQL
    val bloom = {
      import org.apache.spark.sql.functions._
      spark.range(100)
        .select(xxhash64(col("id").cast("string")).as("h"))
        .agg(BloomOps.bloomAgg(col("h"), 100L, BloomOps.optimalNumBits(100L, 0.01)))
        .head().getAs[Array[Byte]](0)
    }
    spark.createDataFrame(Seq(Tuple1(bloom))).toDF("bf").createOrReplaceTempView("bf_v")
    val hit = spark.sql(
      "SELECT graft_might_contain((SELECT bf FROM bf_v), xxhash64(CAST(7 AS STRING))) AS m")
      .collect()(0).getBoolean(0)
    assert(hit)
  }

  test("the extensions class injects every function without error") {
    // the spark.sql.extensions entry point (applied at session build)
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
