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
      "o_custkey", "c_custkey", expectedItems = math.max(1L, dim.count()))
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
    assert(BloomJoin.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey", 1L)
      .count() == 0)
  }

  test("the probe filter sits on the fact scan, before the join") {
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
    val dim = graft.Tables.load(spark, sf("sf0.001"), "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val plan = BloomJoin.bloomSemiJoin(orders, dim,
      "o_custkey", "c_custkey", math.max(1L, dim.count()))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }

  test("bloomProbe keeps every true key (no false negatives by construction)") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val fact = Seq(1L, 2L, 3L, 4L, 5L).toDF("fk")
    val kept = fact.filter(BloomJoin.bloomProbe(dim, "k", $"fk", 3L))
      .as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(kept))
  }
}
