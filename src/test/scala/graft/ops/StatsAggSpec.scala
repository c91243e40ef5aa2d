package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The q_agg_stats battery computes stddev/corr from exact decimal
  * sufficient statistics (order-independent, cross-engine-deterministic).
  * This spec pins that form to Spark's native statistical aggregates —
  * if either drifts, the formula (or a Spark behavior change) is caught
  * here rather than as a silent oracle mismatch.
  */
class StatsAggSpec extends SparkSpec {

  test("sufficient-stats battery matches native stddev_samp/corr to 1e-9") {
    val dir = sf("sf0.001")
    val battery = SparkEntry.queries("q_agg_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val native = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(
        avg(col("l_quantity")).as("mean_qty"),
        var_samp(col("l_quantity")).as("var_qty"),
        stddev_samp(col("l_quantity")).as("stddev_qty"),
        corr(col("l_quantity"), col("l_extendedprice")).as("corr_qty_price"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(battery.keySet == native.keySet)
    for (flag <- battery.keySet) {
      val b = battery(flag); val n = native(flag)
      // battery columns: l_returnflag, n, mean_qty, var_qty, stddev_qty, corr
      def rel(x: Double, y: Double) = math.abs(x - y) / math.max(1e-12, math.abs(y))
      assert(rel(b.getDouble(2), n.getDouble(1)) < 1e-9, s"mean $flag")
      assert(rel(b.getDouble(3), n.getDouble(2)) < 1e-9, s"var $flag")
      assert(rel(b.getDouble(4), n.getDouble(3)) < 1e-9, s"stddev $flag")
      assert(rel(b.getDouble(5), n.getDouble(4)) < 1e-6, s"corr $flag")
    }
  }

  test("null-safe join plans as a hash join with NULL as an ordinary key") {
    val df = SparkEntry.queries("q_j_nullsafe")(spark, sf("sf0.001"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"null-safe equality degraded to a product:\n$p")
    // NULL segment row must survive the join
    val rows = df.collect()
    assert(rows.exists(_.isNullAt(0)), "NULL key bucket missing")
    // every customer matches exactly one seg row (nullsafe ⇒ NULL≍NULL)
    val nCust = spark.read.parquet(s"${sf("sf0.001")}/customer.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nCust, s"unexpected total")
  }
}
