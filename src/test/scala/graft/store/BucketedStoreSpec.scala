package graft.store

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedStoreSpec extends SparkSpec {

  test("co-bucketed tables join with no Exchange on either side") {
    val orders = graft.Tables.load(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.Tables.load(spark, sf(), "lineitem")
      .select("l_orderkey", "l_quantity")
    BucketedStore.saveBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    BucketedStore.saveBucketed(lineitem, "b_lineitem", Seq("l_orderkey"), 8)
    try {
      // co-located join must not shuffle: bucketing pre-partitions both
      // sides on the join key with matching bucket counts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = BucketedStore.read(spark, "b_orders")
        .join(BucketedStore.read(spark, "b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(!plan.contains("Exchange"), plan)
      // and it still computes the right thing
      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("external bucketed layout: one file per bucket, shuffle-free join") {
    val base = java.nio.file.Files.createTempDirectory("graft-bext")
    val orders = graft.Tables.load(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = graft.Tables.load(spark, sf(), "customer")
      .select("c_custkey", "c_mktsegment")
    BucketedStore.saveBucketedExternal(orders, "be_orders",
      s"$base/o", Seq("o_custkey"), numBuckets = 8)
    BucketedStore.saveBucketedExternal(customer, "be_customer",
      s"$base/c", Seq("c_custkey"), numBuckets = 8)
    try {
      // data landed at the external path, pre-partitioned: exactly one
      // parquet file per non-empty bucket (the sorted-scan layout)
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$base/o")).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
      assert(files.nonEmpty && files.size <= 8, files)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = BucketedStore.read(spark, "be_orders")
        .join(BucketedStore.read(spark, "be_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(!plan.contains("Exchange"), plan)
      val expected = orders
        .join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS be_orders")
      spark.sql("DROP TABLE IF EXISTS be_customer")
    }
  }
}
