package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with
  * `right.ts <= left.ts` per key — the canonical time-series lookup
  * (sensor reading → config in force at that moment).
  *
  * Spark has no native ASOF; the naive forms are a per-row correlated
  * subquery or an inequality join (BroadcastNestedLoop — quadratic). This
  * implementation is the scale-correct merge plan: union both sides,
  * shuffle+sort ONCE by (keys, ts, side-tag), then forward-fill the right
  * payload with `last(_, ignoreNulls)` over the ordered window and keep
  * left rows. Cost = one exchange + one sort, same as a sort-merge join.
  *
  * Ties: a right row at exactly left.ts wins (tag orders right before
  * left at equal ts). Right rows must be unique per (keys, ts) — dedupe
  * upstream — otherwise which-equal-row-wins is tie-broken by the fill
  * order.
  */
object AsofJoin {

  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightCols: Seq[String], prefix: String = ""): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val out = rightCols.map(c => s"$prefix$c")
    val rightTypes = rightCols.map(c => right.schema(c).dataType)

    val lSide = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__tag")) ++
        leftPayload.map(col) ++
        rightCols.zip(rightTypes).map { case (c, t) => lit(null).cast(t).as(s"$prefix$c") }: _*)
    val rSide = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__tag")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"$prefix$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .select(
        keys.map(col) ++ Seq(col(tsCol), col("__tag")) ++ leftPayload.map(col) ++
          out.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__tag") === 1)
      .drop("__tag")
  }
}
