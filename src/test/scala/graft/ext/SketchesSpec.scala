package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct estimate lands within the configured error of exact") {
    val li = graft.Tables.load(spark, sf("sf0.01"), "lineitem")
    val approx = Sketches.approxDistinctProfile(li, "l_returnflag", "l_partkey", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex < 0.1, s"$k: approx $ap vs exact $ex")
    }
  }

  test("approximate quantiles bracket the exact median") {
    val li = graft.Tables.load(spark, sf("sf0.01"), "lineitem")
    val qs = Sketches.quantileProfile(li, "l_quantity", Seq(0.5), relativeError = 0.01)
      .collect()(0).getSeq[Double](0)
    val exact = li.stat.approxQuantile("l_quantity", Array(0.5), 0.0)(0)
    assert(math.abs(qs.head - exact) <= 2.0, s"median ${qs.head} vs $exact")
  }

  test("heavy hitters finds the true top groups with exact counts") {
    val ev = graft.Tables.load(spark, sf("sf0.01"), "events")
    val top = Sketches.heavyHitters(ev, "event_type", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val all = ev.groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(t => (-t._2, t._1))
    assert(top.toSeq === all.take(3).toSeq)
  }
}
