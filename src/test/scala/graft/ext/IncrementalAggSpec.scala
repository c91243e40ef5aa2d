package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("merge of split states equals state of the union (monoid identity)") {
    val ev = graft.Tables.load(spark, sf("sf0.001"), "events")
    val keys = Seq("event_type")
    val whole = IncrementalAgg.finalizeState(
      IncrementalAgg.buildState(ev, keys, "value"), keys)
    val folded = IncrementalAgg.finalizeState(
      IncrementalAgg.mergeStates(
        (0 until 4).map(i =>
          IncrementalAgg.buildState(ev.filter($"event_id" % 4 === i), keys, "value")),
        keys), keys)
    assert(folded.unionByName(whole).distinct().count() == whole.count(),
      "fold and global rollup disagree")
  }

  test("merge is associative: ((a+b)+c) == (a+(b+c))") {
    val ev = graft.Tables.load(spark, sf("sf0.001"), "events")
    val keys = Seq("event_type")
    val ss = (0 until 3).map(i =>
      IncrementalAgg.buildState(ev.filter($"event_id" % 3 === i), keys, "value"))
    val left = IncrementalAgg.mergeStates(
      Seq(IncrementalAgg.mergeStates(Seq(ss(0), ss(1)), keys), ss(2)), keys)
    val right = IncrementalAgg.mergeStates(
      Seq(ss(0), IncrementalAgg.mergeStates(Seq(ss(1), ss(2)), keys)), keys)
    assert(left.unionByName(right).distinct().count() == left.count())
  }

  test("state stays key-sized: one row per key, exact decimal sums") {
    val df = Seq(("a", 0.01), ("a", 0.02), ("b", 490.02)).toDF("k", "value")
    val st = IncrementalAgg.buildState(df, Seq("k"), "value")
    assert(st.count() == 2)
    val a = st.filter($"k" === "a").select($"sum_cents".cast("long")).head().getLong(0)
    assert(a == 3L) // 1 + 2 cents, exact
  }
}
