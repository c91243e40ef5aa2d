package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.PlanExpression
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, SortExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExecBase

/** Whole-registry physical-plan sweep — the standing form of the audit
  * the per-round verdicts run by hand ("whole-registry explain sweep
  * remains CartesianProduct-free"): build EVERY registered query at a
  * small sf and report scale smells, detected on the physical plan
  * NODES (ADVICE r15: Spark never prints the "PartitionSpec: []" label
  * the old string grep looked for, so the grep could never fire):
  *
  *  - [[CartesianProductExec]] — an unbounded all-pairs term (broadcast
  *    nested-loop over a bounded side is fine and NOT flagged);
  *  - [[WindowExecBase]] with an empty partition spec — a corpus-wide
  *    single-task funnel;
  *  - a global [[SortExec]] NOT under a limit operator ([[GlobalLimitExec]]
  *    / [[CollectLimitExec]] / [[TakeOrderedAndProjectExec]]) — a
  *    whole-result range sort, reported for eyes (a range-partitioned
  *    sort is distributed, but at 100 TB it is a full extra exchange;
  *    fine when the frame is bounded or the sort IS the product, e.g. a
  *    curriculum ordering).
  *
  * Exit 1 if any query carries a CartesianProduct — the one shape with
  * no 100 TB excuse. The others print as warnings for adjudication
  * (some queries legitimately sort a bounded/metadata-sized frame).
  *
  * Usage: tools/run.sh graft.PlanSweep [sfDir] [query...]
  * (default sf0.001 and the whole registry; building a query may
  * EXECUTE its eager setup — trains, incremental stores — so the sweep
  * runs real code, which is the point.)
  */
object PlanSweep {

  /** The scale smells one query's physical plan carries. */
  case class Smells(cartesian: Int, globalWindows: Int, unlimitedSorts: Int)

  /** Detect smells on `df`'s executed physical plan, with AQE wrappers
    * unwrapped (an [[AdaptiveSparkPlanExec]] is a LEAF to `collect` —
    * its current plan is only reachable through `executedPlan`, which
    * before the first job is the initial physical plan) and subquery
    * plans swept too (a cartesian hiding in a scalar subquery is still
    * a cartesian; `sparkPlan` would NOT do — subqueries are planned in
    * the executedPlan preparation, so at that stage a subquery
    * expression still holds a LOGICAL plan and casts blow up). */
  def smellsOf(df: DataFrame): Smells = {
    val plan = df.queryExecution.executedPlan
    // every physical node, descending through AQE wrappers and into
    // planned subquery expressions (ScalarSubquery/InSubqueryExec hold
    // a BaseSubqueryExec — itself a SparkPlan)
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case _ =>
        val subs = p.expressions.flatMap(_.collect {
          case pe: PlanExpression[_] => pe.plan
        }).collect { case sp: SparkPlan => sp }
        p +: (p.children ++ subs).flatMap(nodes)
    }
    val all = nodes(plan)
    val cartesian = all.count(_.isInstanceOf[CartesianProductExec])
    val globalWindows = all.count {
      case w: WindowExecBase => w.partitionSpec.isEmpty
      case _ => false
    }
    // global Sort with no limit ancestor: walk with a limit flag — a
    // Sort directly under GlobalLimit/CollectLimit is a top-k in
    // disguise (and TakeOrderedAndProject never plans a SortExec at
    // all). Subquery trees restart with no limit ancestry.
    def unlimitedSorts(p: SparkPlan, underLimit: Boolean): Int = p match {
      case a: AdaptiveSparkPlanExec => unlimitedSorts(a.executedPlan, underLimit)
      case _ =>
        val here = p match {
          case s: SortExec if s.global && !underLimit => 1
          case _ => 0
        }
        val ul = underLimit || (p match {
          case _: GlobalLimitExec | _: CollectLimitExec |
               _: TakeOrderedAndProjectExec => true
          case _ => false
        })
        val subs = p.expressions.flatMap(_.collect {
          case pe: PlanExpression[_] => pe.plan
        }).collect { case sp: SparkPlan => sp }
        here + p.children.map(unlimitedSorts(_, ul)).sum +
          subs.map(unlimitedSorts(_, underLimit = false)).sum
    }
    Smells(cartesian, globalWindows, unlimitedSorts(plan, underLimit = false))
  }

  /** Smell kinds, used as the second half of the adjudication key. */
  val KindWindow = "global-window"
  val KindSort = "global-sort-no-limit"

  /** Warnings already adjudicated bounded ((query, smell-kind) → why).
    * A smell NOT in this map prints as NEW — the sweep is a regression
    * detector for plan funnels, and a fresh unreviewed global window
    * must not blend into a known list. Keyed by KIND as well as query
    * (ADVICE r16): a query adjudicated for a bounded window must not
    * also silently mask a fresh unlimited sort on the same query.
    * Adjudications live here (next to the detector, reviewed with it)
    * and are mirrored in SCALE.md's r16 plan-sweep note. */
  val adjudicated: Map[(String, String), String] = Map(
    ("q_corpus_report_kmv", KindWindow) ->
      "rollup windows over kept KMV states (sources×k rows)",
    ("q_eval_auc", KindWindow) ->
      "cumulative window over the ≤10⁴+1-value quality-score lattice",
    ("q_eval_roc", KindWindow) ->
      "cumulative window over the ≤10⁴+1-value quality-score lattice",
    ("q_sample_weighted", KindWindow) ->
      "window over ≤1024 per-bucket totals; the corpus prefix sum is bucket-partitioned",
    ("q_stats_gini", KindWindow) -> "window over per-source totals (facet-sized)",
    ("q_sql_q11", KindSort) -> "TPC-H presentation ORDER BY over the value-filtered group frame",
    ("q_sql_q20", KindSort) -> "TPC-H presentation ORDER BY over the supplier-bounded result",
    ("q_sql_q21", KindSort) -> "TPC-H presentation ORDER BY over the supplier-bounded result")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    var products = List.empty[String]
    var globalWindows = List.empty[String]
    var sorts = List.empty[String]
    var failed = List.empty[String]
    names.foreach { n =>
      try {
        val s = smellsOf(SparkEntry.queries(n)(spark, sfDir))
        if (s.cartesian > 0) products ::= n
        if (s.globalWindows > 0) globalWindows ::= n
        if (s.unlimitedSorts > 0) sorts ::= n
      } catch {
        case e: Throwable =>
          failed ::= s"$n: ${e.getClass.getSimpleName} ${e.getMessage}"
      }
    }
    println(s"swept ${names.size} queries at $sfDir")
    if (products.nonEmpty)
      println(s"CARTESIAN PRODUCT (fail): ${products.sorted.mkString(", ")}")
    def report(kind: String, hint: String, hits: List[String]): List[String] = {
      // only THIS kind's adjudications apply — a query adjudicated for a
      // bounded window still reports a fresh sort as NEW (ADVICE r16)
      val (known, fresh) = hits.sorted.partition(n => adjudicated.contains((n, kind)))
      if (known.nonEmpty)
        println(s"$kind (adjudicated bounded): " + known.map(n =>
          s"$n [${adjudicated((n, kind))}]").mkString("; "))
      if (fresh.nonEmpty)
        println(s"$kind NEW ($hint): ${fresh.mkString(", ")} — adjudicate " +
          "and add to PlanSweep.adjudicated, or fix the funnel")
      fresh
    }
    val newWindows = report(KindWindow,
      "fine only on driver-bounded frames", globalWindows)
    val newSorts = report(KindSort,
      "fine when the ordering is the product or the frame is bounded", sorts)
    failed.sorted.foreach(f => println(s"BUILD FAILED: $f"))
    if (products.isEmpty && failed.isEmpty &&
        newWindows.isEmpty && newSorts.isEmpty) println("sweep clean")
    spark.stop()
    // exit contract (ADVICE r16: NEW smells must be machine-visible, not
    // just a printed line): 1 = hard fail (cartesian / build failure),
    // 2 = fresh unadjudicated smells — a CI gate keyed on rc catches both.
    if (products.nonEmpty || failed.nonEmpty) sys.exit(1)
    if (newWindows.nonEmpty || newSorts.nonEmpty) sys.exit(2)
  }
}
