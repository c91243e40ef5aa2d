package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage (the Fellegi–Sunter 1969 shape with fixed
  * integer agreement weights): candidate pairs come from an EQUI-JOIN on
  * a blocking key — never a cross product — and each candidate is scored
  * by summing per-field agreement weights; pairs at or above the
  * threshold link. The probabilistic weights of the full model are
  * log-ratios (floats, engine-dependent); fixing them as integers keeps
  * the decision rule exact and hash-checkable while preserving the
  * structure (blocking → field comparison vector → weighted decision).
  *
  * Scale shape: one equi-join on the blocking key (both sides shuffle
  * once on it; block sizes bound the pair fan-out, the classic linkage
  * scalability contract — a degenerate block key degrades to all-pairs,
  * which is the CALLER's modeling error, same as an LSH band with no
  * entropy), then pure codegen projections. No windows, no state.
  */
object Linkage {

  /** One comparison rule: output column name, agreement weight, and the
    * agreement predicate over (left column, right column). */
  final case class Rule(name: String, weight: Long,
      agree: (Column, Column) => Column)

  /** Link `a` to `b` through equality on `blockCols` (present in both
    * frames). NAMING CONTRACT: for every rule `r`, frame `a` must carry
    * a column `a_<r.name>` and frame `b` a column `b_<r.name>` — those
    * are the two columns handed to `r.agree` (left, right). Emits the
    * pair ids, the per-rule scores (s_<rule>), and the total; keeps
    * pairs with score ≥ threshold. */
  def linkRecords(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      rules: Seq[Rule], idA: String, idB: String,
      threshold: Long): DataFrame = {
    require(blockCols.nonEmpty, "linkRecords: need a blocking key")
    require(rules.nonEmpty, "linkRecords: need at least one rule")
    val joined = a.join(b, blockCols)
    val scoreCols = rules.map { r =>
      when(r.agree(col(s"a_${r.name}"), col(s"b_${r.name}")), r.weight)
        .otherwise(0L).as(s"s_${r.name}")
    }
    val total = rules.map(r => col(s"s_${r.name}")).reduce(_ + _)
    joined
      .select(col(idA) +: col(idB) +: scoreCols: _*)
      .withColumn("score", total)
      .filter(col("score") >= threshold)
  }
}
