package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout contract of [[TableStore.overwriteZOrdered]]: content identical
  * to the input, and per-file footer ranges tight in BOTH z dimensions —
  * the property that lets a 2-D box predicate skip most files at 100 TB,
  * where a lexicographic sort prunes only its leading column. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def fileRanges(path: String, c1: String, c2: String) =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c1)).as("mn1"), max(col(c1)).as("mx1"),
        min(col(c2)).as("mn2"), max(col(c2)).as("mx2"))
      .as[(String, Long, Long, Double, Double)].collect()

  test("z-ordered rewrite preserves content exactly") {
    val ev = graft.Tables.load(spark, sf("sf0.001"), "events")
    val store = new TableStore(spark,
      Files.createTempDirectory("zorder-content").toString)
    store.overwriteZOrdered("ev", ev, Seq("user_id", "value"), numFiles = 4)
    val back = store.read("ev")
    assert(back.exceptAll(ev).count() == 0 && ev.exceptAll(back).count() == 0)
    assert(back.columns.sorted.sameElements(ev.columns.sorted), "schema changed")
  }

  test("box predicates prune files in the SECOND dimension too") {
    val ev = graft.Tables.load(spark, sf("sf0.01"), "events")
    val dir = Files.createTempDirectory("zorder-prune").toString
    val store = new TableStore(spark, dir)
    store.overwriteZOrdered("z", ev, Seq("user_id", "value"), numFiles = 16)
    store.overwriteClustered("lex", ev, Seq("user_id", "value"), numFiles = 16)

    // a value-only band predicate (~11 % of rows): lexicographic layout
    // can't prune on its SECOND sort column (every file spans ~the full
    // value range), the z layout must
    def hit(ranges: Seq[(String, Long, Long, Double, Double)],
        lo: Double, hi: Double): Int =
      ranges.count { case (_, _, _, mn2, mx2) => mx2 >= lo && mn2 <= hi }

    val zRanges = fileRanges(store.path("z"), "user_id", "value")
    val lexRanges = fileRanges(store.path("lex"), "user_id", "value")
    assert(zRanges.length >= 8 && lexRanges.length >= 8, "want multi-file layouts")

    val zHits = hit(zRanges, 100.0, 200.0)
    val lexHits = hit(lexRanges, 100.0, 200.0)
    assert(lexHits == lexRanges.length,
      s"expected lex layout to be unprunable on value, hit $lexHits/${lexRanges.length}")
    assert(zHits <= zRanges.length / 2,
      s"z layout pruned too little: $zHits/${zRanges.length} files intersect")
  }
}
