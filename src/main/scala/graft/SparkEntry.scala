package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator exposed by the engine; each entry
  * has (where SQL-expressible) a DuckDB oracle in `oracleSql` with
  * identical column names/aliases. Query registries live next to the code
  * they exercise (graft.queries.*, graft.ext.*).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
    graft.queries.Scd2Queries.queries ++
    graft.queries.ExtQueries.queries ++
    graft.queries.ScaleQueries.queries ++
    graft.queries.PipelineQueries.queries ++
    graft.queries.PollQueries.queries ++
    graft.queries.QualityQueries.queries

  /** Untimed per-query bench setup (VERDICT r12 #3): for queries that
    * search a persisted index, Bench runs this BEFORE starting the
    * timer, so the timed sample measures search only regardless of
    * scratch state (cold scratch used to silently fold an index build
    * into the "search" time). Verify does NOT call these — the queries
    * themselves still lazily ensure their index, so correctness runs
    * are self-contained. */
  def benchSetup: Map[String, (SparkSession, String) => Unit] =
    graft.queries.ExtQueries.benchSetup

  /** Pair-bounded queries (query → counter name) and the counters that
    * measure the current draw's candidate-pair volume. Bench records
    * the counter values untimed; the gate normalizes the mapped
    * queries' limits by pair-count ratio (VERDICT r13 #1b). */
  def pairBounded: Map[String, String] =
    graft.queries.ExtQueries.pairBounded

  def pairCounters: Map[String, (SparkSession, String) => Long] =
    graft.queries.ExtQueries.pairCounters

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
    graft.queries.Scd2Queries.oracleSql ++
    graft.queries.ExtQueries.oracleSql ++
    graft.queries.ScaleQueries.oracleSql ++
    graft.queries.PipelineQueries.oracleSql ++
    graft.queries.PollQueries.oracleSql ++
    graft.queries.QualityQueries.oracleSql
}
