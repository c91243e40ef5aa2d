package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi join equals the plain semi join (no false negatives survive)") {
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
    val dim = graft.Tables.load(spark, sf("sf0.001"), "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val viaBloom = BloomJoin.bloomSemiJoin(orders, dim,
      "o_custkey", "c_custkey", expectedItems = Some(math.max(1L, dim.count())))
      .select($"o_orderkey")
    val plain = orders.join(dim, $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey")
    assert(viaBloom.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(viaBloom).count() == 0)
  }

  test("empty dim yields an empty result, not a scan") {
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
    val dim = graft.Tables.load(spark, sf("sf0.001"), "customer")
      .filter(lit(false)).select($"c_custkey")
    assert(BloomJoin.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey", Some(1L))
      .count() == 0)
  }

  test("the probe filter sits on the fact scan, before the join") {
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
    val dim = graft.Tables.load(spark, sf("sf0.001"), "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val plan = BloomJoin.bloomSemiJoin(orders, dim,
      "o_custkey", "c_custkey", Some(math.max(1L, dim.count())))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }

  test("bloomProbe keeps every true key (no false negatives by construction)") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val fact = Seq(1L, 2L, 3L, 4L, 5L).toDF("fk")
    val kept = fact.filter(BloomJoin.bloomProbe(dim, "k", $"fk", Some(3L)))
      .as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(kept))
  }

  /** Jobs launched from this thread under a named job group — job-group
    * tagging is synchronous (propagated through the thread-local
    * properties), so no listener-bus race. */
  private def jobsIn(group: String)(body: => Unit): Int = {
    spark.sparkContext.setJobGroup(group, group)
    try body finally spark.sparkContext.clearJobGroup()
    spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
  }

  test("stats-based sizing saves the driver-side dim-count job") {
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
    val dim = graft.Tables.load(spark, sf("sf0.001"), "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val withCount = jobsIn("bloom-explicit") {
      val n = math.max(1L, dim.count())
      BloomJoin.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey", Some(n))
        .count()
    }
    val fromStats = jobsIn("bloom-stats") {
      BloomJoin.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey").count()
    }
    // the explicit path pays the dim.count() job(s) — under AQE a count
    // can be more than one job, so assert strict saving, not exactly one
    assert(fromStats < withCount,
      s"expected fewer jobs without the count, got $fromStats vs $withCount")
    // and both produce the same rows as the plain semi join
    val plain = orders.join(dim, $"o_custkey" === $"c_custkey", "left_semi")
    assert(BloomJoin.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey")
      .count() == plain.count())
  }

  test("sizeHint clamps and never needs a scan") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val hint = BloomJoin.sizeHint(dim, None)
    assert(hint.exists(h => h >= 1024L && h <= (1L << 24)))
    assert(BloomJoin.sizeHint(dim, Some(5L)).contains(1024L))  // floor
    // past the cap the Bloom stops paying — sizing opts out entirely
    assert(BloomJoin.sizeHint(dim, Some(Long.MaxValue)).isEmpty)
  }

  test("oversized dim skips the bloom but keeps exact semi-join semantics") {
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
    val dim = graft.Tables.load(spark, sf("sf0.001"), "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val skipped = BloomJoin.bloomSemiJoin(orders, dim,
      "o_custkey", "c_custkey", Some(Long.MaxValue))
    val plan = skipped.queryExecution.executedPlan.toString()
    assert(!plan.contains("might_contain"), s"bloom should be skipped:\n$plan")
    val plain = orders.join(dim, $"o_custkey" === $"c_custkey", "left_semi")
    assert(skipped.count() == plain.count())
    // bloomProbe's opt-out is a pass-through, never a filter
    val kept = Seq(1L, 9L).toDF("fk")
      .filter(BloomJoin.bloomProbe(Seq(1L).toDF("k"), "k", $"fk", Some(Long.MaxValue)))
      .count()
    assert(kept == 2L)
  }
}
