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
}
