package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofLeft picks the latest right row at-or-before each left row") {
    val readings = Seq(
      (1L, ts("2024-01-01 10:00:00"), "r1"),
      (1L, ts("2024-01-01 12:00:00"), "r2"),
      (2L, ts("2024-01-01 09:00:00"), "r3"))
      .toDF("k", "ts", "reading")
    val configs = Seq(
      (1L, ts("2024-01-01 09:00:00"), "cfgA"),
      (1L, ts("2024-01-01 12:00:00"), "cfgB"), // exactly at r2 → wins for r2
      (2L, ts("2024-01-01 10:00:00"), "cfgC")) // after r3 → no match
      .toDF("k", "ts", "cfg")
    val out = AsofJoin.asofLeft(readings, configs, Seq("k"), "ts", Seq("cfg"))
      .collect().map(r => r.getAs[String]("reading") -> r.getAs[String]("cfg")).toMap
    assert(out === Map("r1" -> "cfgA", "r2" -> "cfgB", "r3" -> null))
  }

  test("pointInInterval matches exactly the between semantics across bin edges") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:15:00")),
      (1L, 11L, ts("2024-01-01 11:59:59")), // inside, far bin from start
      (1L, 12L, ts("2024-01-01 13:00:01")), // outside
      (2L, 20L, ts("2024-01-01 10:15:00"))) // wrong key
      .toDF("k", "pid", "ts")
    val intervals = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00")))
      .toDF("k", "iid", "start_ts", "end_ts")
    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "ts", "start_ts", "end_ts", binMs = 15 * 60 * 1000L)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(10L, 11L))
  }
}
