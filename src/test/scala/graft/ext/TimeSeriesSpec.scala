package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resample buckets to the grid and sums exactly") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1.25),
      (1L, ts("2024-01-01 00:50:00"), 2.75),
      (1L, ts("2024-01-01 02:05:00"), 10.00),
      (2L, ts("2024-01-01 00:59:59"), 7.00)
    ).toDF("user_id", "ts", "value")
    val res = TimeSeries.resample(df, "user_id", "ts", "value", 3600)
      .select($"user_id", $"bucket", $"n", ($"sum_cents".cast("double") / 100.0).as("s"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val h0 = ts("2024-01-01 00:00:00").getTime / 1000
    assert(res == Set(
      (1L, h0, 2L, 4.0),          // 1.25 + 2.75, same hour
      (1L, h0 + 7200, 1L, 10.0),  // hour 2
      (2L, h0, 1L, 7.0)))
  }

  test("interpolation fills interior gaps linearly and keeps observed points") {
    val df = Seq(
      (1L, ts("2024-01-01 00:30:00"), 10.0), // bucket h0: v=10
      (1L, ts("2024-01-01 03:30:00"), 40.0)  // bucket h3: v=40; h1,h2 are gaps
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.interpolateLinear(df, "user_id", "ts", "value", 3600)
      .orderBy($"bucket")
      .select($"v", $"v_interp").as[(Option[Double], Double)].collect()
    assert(out.length == 4)
    assert(out(0) == (Some(10.0), 10.0))
    assert(out(1) == (None, 20.0)) // 10 + (40-10) * 1/3
    assert(out(2) == (None, 30.0))
    assert(out(3) == (Some(40.0), 40.0))
  }

  test("interpolation grid is per-key bounded by that key's own span") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 05:00:00"), 2.0),
      (2L, ts("2024-01-01 02:00:00"), 3.0) // single bucket → 1 grid row
    ).toDF("user_id", "ts", "value")
    val counts = TimeSeries.interpolateLinear(df, "user_id", "ts", "value", 3600)
      .groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 6L, 2L -> 1L))
  }

  test("interpolation windows are partitioned by key (no global window)") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("user_id", "ts", "value")
    val plan = TimeSeries.interpolateLinear(df, "user_id", "ts", "value", 3600)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("SinglePartition"),
      s"found a single-partition exchange in:\n$plan")
  }
}
