package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def mkA = Seq(
    (1L, "IL", "001", "alice jones", 10000L, "GOLD"),
    (2L, "IL", "002", "bob smith", 20000L, "SILVER"),
    (3L, "CA", "003", "carol wu", 30000L, "GOLD"))
    .toDF("a_id", "bn", "bd", "a_name", "a_cents", "a_seg")

  private val rules = Seq(
    Linkage.Rule("name", 40L, (x, y) => x === y),
    Linkage.Rule("cents", 25L, (x, y) => abs(x - y) <= 5L),
    Linkage.Rule("seg", 10L, (x, y) => x === y))

  test("linkage: agreement weights compose; threshold gates") {
    val b = Seq(
      // exact twin of 1 → 75
      (11L, "IL", "001", "alice jones", 10000L, "GOLD"),
      // name defaced, balance +3¢, seg kept → 35 (threshold boundary)
      (12L, "IL", "002", "bob smXth", 20003L, "SILVER"),
      // name defaced, balance +9¢, seg lost → 0 (drops)
      (13L, "CA", "003", "carol wX", 30009L, "UNKNOWN"))
      .toDF("b_id", "bn", "bd", "b_name", "b_cents", "b_seg")
    val out = Linkage.linkRecords(mkA, b, Seq("bn", "bd"), rules,
      "a_id", "b_id", threshold = 35L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("score"))).toSet
    assert(out === Set((1L, 11L, 75L), (2L, 12L, 35L)))
  }

  test("linkage: blocking is a hard gate — identical records in different blocks never pair") {
    val b = Seq((21L, "NY", "001", "alice jones", 10000L, "GOLD"))
      .toDF("b_id", "bn", "bd", "b_name", "b_cents", "b_seg")
    assert(Linkage.linkRecords(mkA, b, Seq("bn", "bd"), rules,
      "a_id", "b_id", threshold = 0L).count() === 0L)
  }

  test("linkage: per-rule score columns are exposed for audit") {
    val b = Seq((31L, "IL", "001", "alice jones", 10020L, "GOLD"))
      .toDF("b_id", "bn", "bd", "b_name", "b_cents", "b_seg")
    val r = Linkage.linkRecords(mkA, b, Seq("bn", "bd"), rules,
      "a_id", "b_id", threshold = 35L).collect().head
    assert(r.getAs[Long]("s_name") === 40L)
    assert(r.getAs[Long]("s_cents") === 0L) // 20¢ apart > 5¢
    assert(r.getAs[Long]("s_seg") === 10L)
    assert(r.getAs[Long]("score") === 50L)
  }
}
