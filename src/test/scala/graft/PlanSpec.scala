package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan assertions: the scale properties SURVEY §4 promises are
  * checked here as plan shapes, so a regression (lost pushdown, a
  * broadcast degrading to sort-merge, top-k materializing a global sort)
  * fails the suite rather than only showing up in bench numbers.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.explainString(FormattedMode)
  }

  test("projection-only scan prunes columns at the parquet reader (S4)") {
    val p = plan("q_s4_scan")
    assert(p.contains("ReadSchema"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("p_partkey") && read.contains("p_name"))
    assert(!read.contains("p_type"), s"unpruned scan: $read")
  }

  test("equality predicates push into the scan (P2)") {
    val p = plan("q_p2_equality")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(o_orderstatus,F)"), pushed)
    assert(pushed.contains("EqualTo(o_orderpriority,1-URGENT)"), pushed)
  }

  test("q1 aggregation: filter pushed, partial+final HashAggregate") {
    val p = plan("q1_agg")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("LessThanOrEqual(l_shipdate")), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final aggregation")
  }

  test("dimension joins broadcast; no shuffle of the fact side (J2)") {
    val p = plan("q_j2_inner")
    // formatted mode repeats each node in the detail section → count ≥ 2
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), "dim join degraded to SMJ")
  }

  test("1-row aggregate cross join broadcasts (J3)") {
    val p = plan("q_j3_cross_agg")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("top-k runs as TakeOrderedAndProject, not a global sort (O3)") {
    val p = plan("q_o3_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("similarity hot path stays inside whole-stage codegen") {
    // AQE leaves the plan unfinalized (no codegen annotations) until the
    // first job — disable it here to inspect the static physical plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try plan("q_sim_neardup")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the scoring projection (DotProduct) must sit under a codegen span
    // ("codegen id" annotations in formatted mode), not fall back to
    // interpreted projection
    assert(p.contains("codegen id"), p)
    // candidates come from banded-bucket equi-joins — the corpus×corpus
    // product shape (VERDICT r1 #1) must never reappear
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("SimHash dedup plan has no shuffle before the candidate join") {
    val p = plan("q_dedup_simhash")
    // fingerprints are pure projections; allowed exchanges are the input
    // spread (single-split testdata → repartition) plus the band
    // self-join + distinct
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 8, s"unexpected exchange count $exchanges\n$p")
  }

  test("MinHash sketch aggregate runs hash-based, not sort-based") {
    val p = plan("q_dedup_minhash")
    // TypedImperativeAggregate should plan as ObjectHashAggregate; a
    // SortAggregate fallback would add a sort per group exchange
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("SortAggregate"), "sketch aggregate fell back to sort")
  }

  test("semi/anti joins stay joins (no aggregate rewrite) (J5)") {
    assert(plan("q_j5_semi").contains("LeftSemi"))
    assert(plan("q_j5_anti").contains("LeftAnti"))
  }

  test("stratified sample adds no shuffle beyond the input spread") {
    val p = plan("q_sample_stratified")
    // docs() repartitions the single-split testdata once; the sampling
    // decision itself is a pure projection + filter — any further
    // Exchange means the operator stopped being scan-shaped
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"sampling gained a shuffle ($exchanges)\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"), p)
  }

  test("chunking is a pure Generate — no shuffle, no join") {
    val p = plan("q_text_chunks")
    assert(p.contains("Generate"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"chunking gained a shuffle ($exchanges)\n$p")
  }

  test("n-sweep profile: one Generate per side (all n share one explode); gram join broadcasts") {
    val p = plan("q_decontam_profile")
    val gens = "Generate".r.findAllIn(p).size
    // formatted mode names each node once in the tree and once in the
    // detail section — 2 plan nodes (corpus + eval side) ⇒ ≤ 4 mentions,
    // and at least 2; a per-n explode would multiply this by |ns|
    assert(gens >= 2 && gens <= 4, s"expected 2 Generate nodes, saw $gens\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"gram join degraded to SMJ\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sketch-only dedup: no parquet re-scan after the signature checkpoint; no cartesian") {
    val p = plan("q_dedup_sketchonly")
    assert(!p.contains("Scan parquet"),
      s"corpus re-read after signature checkpoint\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("KN LM: text never re-read after the occurrence checkpoint (id-only scan)") {
    val p = plan("q_text_lm_kn")
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(reads.nonEmpty, p)
    assert(reads.forall(r => r.contains("doc_id") && !r.contains("text")),
      s"text column re-read post-checkpoint: $reads")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tf-idf: corpus count broadcasts; no global sort for the per-doc top-k") {
    val p = plan("q_text_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // the rank window partitions by doc — a global Sort would only appear
    // via Window with no partitioning
    assert(!p.contains("No Partition Defined"), p)
  }

  test("stream-join batch twin shuffles both sides on user_id once (no BNLJ)") {
    val p = plan("q_stream_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("cross-modal verification streams pairs through hash joins (nothing quadratic)") {
    val p = plan("q_dedup_crossmodal")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("decontamination: eval grams broadcast; the corpus is never sort-merge joined") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "eval-gram join degraded to SMJ\n" + p)
  }

  test("mixture resampling: rate table broadcasts; the corpus keep-filter is not shuffled") {
    val p = plan("q_sample_mix")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), "rate join degraded to SMJ\n" + p)
  }

  test("sequence packing: running offset windows per bucket, never globally") {
    val p = plan("q_text_pack")
    assert(!p.contains("No Partition Defined"), "global cumsum funnel\n" + p)
  }

  test("repetition battery: per-doc aggregates are partial+final, window is per-doc") {
    val p = plan("q_text_repetition")
    assert(!p.contains("No Partition Defined"), "global window funnel\n" + p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("kmeans cell report: assignment is a projection — no join, no window, no sort-merge") {
    val p = plan("q_sim_kmeans")
    assert(!p.contains("SortMergeJoin"), "centroid join degraded to SMJ\n" + p)
    assert(!p.contains("Window"), "argmin ran as a window\n" + p)
    // the codegen'd integer kernel is in the plan (literal-folded argmin)
    assert(p.contains("squareddistancelong") || p.contains("SquaredDistanceLong"), p)
  }

  test("pq adc search: code/table joins are broadcast hash joins, never corpus-corpus SMJ") {
    val p = plan("q_sim_pq_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "distance table degraded to SMJ\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("gopher battery is a pure projection: no shuffle beyond the input spread") {
    val p = plan("q_text_gopher")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"rule battery gained a shuffle ($exchanges)\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"), p)
  }

  test("q19 disjunction: per-table halves of the OR push to BOTH scans") {
    val p = plan("q_sql_q19")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    // lineitem scan gets the quantity envelope of the OR, part scan the
    // brand/size envelope — neither table is read unfiltered
    assert(pushed.contains("l_quantity"), s"no quantity pushdown:\n$pushed")
    assert(pushed.contains("p_brand") || pushed.contains("p_size"),
      s"no part-side pushdown:\n$pushed")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q7 nation pair: both nation dims broadcast; one fact pipeline") {
    val p = plan("q_sql_q7")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"expected supplier+nation×2 broadcasts\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q18 IN-subquery becomes a semi join, never a re-scan product") {
    val p = plan("q_sql_q18")
    assert(p.contains("LeftSemi"), s"IN subquery not rewritten to semi join\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q21 double-correlated EXISTS: semi + anti joins, no product") {
    val p = plan("q_sql_q21")
    assert(p.contains("LeftSemi"), s"EXISTS not rewritten to semi join\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not rewritten to anti join\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q2 correlated min decorrelates: aggregate re-join, no product") {
    val p = plan("q_sql_q2")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // region/nation/supplier dims all broadcast against the cost CTE
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
  }

  test("q16 NOT IN set stays a broadcast-able exclusion, distinct-agg planned") {
    val p = plan("q_sql_q16")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("windowed count-distinct: every window partitions finer than event_type alone") {
    // the scale hazard is a window partitioned ONLY by the 5-value type
    // key (one task holds ~20 % of the corpus); the two-phase spelling
    // must keep row-bearing windows on (type, user) / (type, bucket).
    // The one single-column window allowed is the prefix pass over the
    // tiny (type, bucket) AGGREGATE (|types|·|days| rows, not data rows).
    val df = SparkEntry.queries("q_w_distinct_running")(spark, sf("sf0.001"))
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val coarse = windows.filter(_.partitionSpec.size < 2)
    coarse.foreach { w =>
      // must sit directly over an Aggregate (state rows), never over rows
      val overAgg = w.find {
        case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
        case _ => false
      }.isDefined
      assert(overAgg, s"single-key window over non-aggregated rows:\n$w")
    }
    // and the data spreads: one event_type spans many (type, day) groups,
    // so the hash exchange before the in-bucket window splits each type
    // across that many reducers instead of one
    val ev = Tables.load(spark, sf("sf0.001"), "events")
    val perType = ev.groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.date_trunc("day",
          org.apache.spark.sql.functions.col("ts"))).as("n_buckets"))
      .agg(org.apache.spark.sql.functions.min("n_buckets")).head().getLong(0)
    assert(perType >= 20, s"expected ≥20 day-buckets per type, got $perType")
  }

  test("pipeline analytics: broadcast-semi gate on the events scan, one fact shuffle") {
    // the composition's scale claim (PipelineQueries scaladoc): the SCD2
    // current slice BROADCASTS into a left-semi on the raw events scan
    // (no fact shuffle to apply the gate), and the only exchange on the
    // fact branch is the (user_id, bucket) resample shuffle. A regression
    // in Historizer output sizing would flip the gate to SortMergeJoin —
    // that must fail here, not surface as a bench number.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try {
      graft.queries.PipelineQueries.gatedResample(spark, sf("sf0.001"))
        .queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // fact branch = everything not under a broadcast exchange (the
    // dimension pipeline hides behind the broadcast boundary)
    def factBranch(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: BroadcastExchangeExec => Seq.empty
      case _ => p +: p.children.flatMap(factBranch)
    }
    val fact = factBranch(plan)
    val semi = fact.collect { case j: BroadcastHashJoinExec
      if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j }
    assert(semi.nonEmpty, s"gate is not a broadcast left-semi join:\n$plan")
    val shuffles = fact.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1,
      s"expected exactly one fact-branch exchange, got ${shuffles.size}:\n$plan")
    // the bucket key appears pre-alias as _groupingexpression in the
    // partial-aggregate exchange
    val part = shuffles.head.outputPartitioning.toString
    assert(part.contains("user_id") &&
      (part.contains("bucket") || part.contains("_groupingexpression")),
      s"fact shuffle is not the resample (user_id, bucket) exchange:\n$plan")
    // and the branch reads the events parquet directly
    assert(fact.exists {
      case f: FileSourceScanExec => f.toString.contains("events")
      case _ => false
    }, s"no direct events scan on the fact branch:\n$plan")
  }

  test("scd2 point-in-time: equi-join on the natural key, never a range product") {
    // the validity test must ride as a post-join filter on an equi-join;
    // a planner that only sees the range predicates would fall back to
    // BroadcastNestedLoopJoin / CartesianProduct — quadratic at scale
    val p = plan("q_scd2_asof")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"point-in-time lookup degraded to a product:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p.take(2000))
  }

  test("kmv sketch: rank filter becomes a map-side WindowGroupLimit") {
    // the k-smallest-per-group filter must run BEFORE the exchange (each
    // map task forwards ≤ k rows per group); losing the rewrite means the
    // shuffle carries every distinct hash instead of O(groups·k)
    val p = plan("q_kmv_distinct")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"rank filter not rewritten to a partial group limit:\n${p.take(3000)}")
  }

  test("ivfpq indexed search: probed-cell IN filter prunes the codes scan") {
    // the q_sim_ivfpq_indexed store lives in per-run scratch; build+search
    // once and inspect the executed plan of the search
    val df = SparkEntry.queries("q_sim_ivfpq_indexed")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(cell"),
      s"probed-cells filter not pushed:\n$p")
  }

  test("bm25: probe-term semi-join sinks below the vocabulary aggregates") {
    // bm25TopDocs writes the probe-term prune ABOVE the full-vocabulary
    // df groupBy; the whole design depends on Catalyst's
    // PushDownLeftSemiAntiJoin sinking it below the aggregate so the
    // shuffle never carries the corpus vocabulary (VERDICT r7 #3). Pin
    // the sunk shape: a LeftSemi broadcast join whose build side is the
    // probe terms and whose STREAMED side has no aggregate under it —
    // i.e. the prune runs on raw exploded terms, before any groupBy.
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // AQE wraps the tree in an AdaptiveSparkPlanExec leaf that collect()
    // cannot descend into — inspect the static physical plan instead
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val phys = try
      SparkEntry.queries("q_text_bm25")(spark, sf("sf0.001"))
        .queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val semis = phys.collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, s"no LeftSemi broadcast join in:\n$phys")
    assert(semis.exists(j =>
      j.left.collect { case a: HashAggregateExec => a }.isEmpty),
      s"semi-join stayed above the df aggregate (streamed side contains " +
        s"an aggregate in every candidate):\n$phys")
  }

  test("lattice quantile profile scans events once (shared window exchange)") {
    // cum and n are windows over the SAME partition — one exchange, one
    // histogram, one scan; a groupBy+join spelling of n would read the
    // fact twice
    val p = plan("q_quantile_profile")
    // formatted mode repeats tree nodes in the detail section — count
    // ReadSchema lines (one per scan detail block) instead
    assert(p.linesIterator.count(_.contains("ReadSchema")) == 1,
      s"histogram input evaluated more than once:\n${p.take(3000)}")
  }

  test("pre-split corpus: ext queries add no round-robin exchange (VERDICT r9 #4)") {
    // docs()/emb() widen a single-split fixture across cores, but on a
    // corpus whose input splits already cover the cores the repartition
    // must be a no-op — an unconditional call would insert a full-text
    // round-robin Exchange before every scan-bound operator
    val tmp = java.nio.file.Files.createTempDirectory("graft-presplit").toString
    val cores = spark.sparkContext.defaultParallelism
    Tables.load(spark, sf("sf0.001"), "documents")
      .repartition(cores * 2)
      .write.parquet(s"$tmp/documents.parquet")
    assert(spark.read.parquet(s"$tmp/documents.parquet")
      .rdd.getNumPartitions >= cores, "fixture not actually pre-split")
    val df = SparkEntry.queries("q_dedup_exact")(spark, tmp)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("RoundRobinPartitioning") && !p.contains("REPARTITION_BY_NUM"),
      s"gratuitous round-robin exchange on a pre-split corpus:\n${p.take(3000)}")
    // the single-split shipped fixture still widens (the compute-bound
    // narrow stages must not run single-threaded)
    val single = SparkEntry.queries("q_dedup_exact")(spark, sf("sf0.001"))
      .queryExecution.explainString(FormattedMode)
    assert(single.contains("RoundRobinPartitioning"),
      s"single-split fixture no longer widens:\n${single.take(3000)}")
  }

  test("cohort retention reads events once (checkpointed projection)") {
    // the (user_id, day) projection is localCheckpointed and feeds BOTH
    // the first-seen aggregate and the fact side — losing that means two
    // full parquet scans of the fact table (VERDICT r7 #4)
    val df = SparkEntry.queries("q_cohort_retention")(spark, sf("sf0.001"))
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Scan parquet"),
      s"final plan still scans parquet (checkpoint not reused):\n${p.take(3000)}")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"expected both branches to read the checkpointed blocks:\n${p.take(3000)}")
  }

  test("classifier train→predict: no products, argmax an aggregate not a window") {
    val p = plan("q_classify_source")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the per-doc argmax is the struct-min aggregate, not a ranking
    // window (the final OOV-restoring left join on doc_id is an
    // ordinary equi-join — fact-fact, shuffle is correct there)
    assert(!p.contains("WindowExec") && !p.contains("Window ("), p.take(2000))
    assert(p.contains("partial_min") || p.contains("partial_count"), p.take(2000))
  }

  test("cluster topics: the only product is the 1-row global total broadcast") {
    val p = plan("q_cluster_topics")
    // the gtot crossJoin(broadcast) is a BroadcastNestedLoopJoin of a
    // 1-row aggregate (J3 shape); nothing else may be a product
    val products = "CartesianProduct".r.findAllIn(p).size
    assert(products === 0, s"cartesian in plan:\n${p.take(2000)}")
    // top-N per cluster compiles to the rank-filter WindowGroupLimit
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("temperature mixture: schedule broadcasts; the corpus keep-filter is not re-shuffled") {
    val p = plan("q_sample_temperature")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // rates (stratum-count-sized) reach the corpus through broadcast
    // joins — the doc side must never sort-merge against them
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("paragraph dedup: keep-first is an aggregate, not a digest window") {
    val p = plan("q_dedup_paragraph")
    // a corpus-wide boilerplate paragraph makes its digest a hot key; a
    // window over dg would funnel every instance into one task, while
    // the min-struct aggregate combines map-side (partial+final pairs)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val windows = p.linesIterator.count(l =>
      l.trim.startsWith("Window") || l.contains("(Window"))
    assert(windows === 0, s"digest window in plan:\n${p.take(2000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("CMS build aggregates partial+final: the shuffle is sketch-sized") {
    val p = plan("q_sketch_cms")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // explode(depth entries) then partial HashAggregate before the
    // exchange — ≤ depth·width rows leave each map partition
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("JL projection is a pure scan: no shuffle, no join") {
    val p = plan("q_emb_project")
    assert(!p.contains("Join"), p.take(2000))
    // the only exchange tolerated is the fixture-widening round robin
    // (formatted mode puts the partitioning in the detail section)
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
      s"keyed shuffle in projection plan:\n${p.take(2000)}")
  }

  test("MMR: candidate-pool products only, never corpus x corpus") {
    val df = SparkEntry.queries("q_retrieval_mmr")(spark, sf("sf0.001"))
    df.collect() // materialize through AQE so join strategies are final
    val p = df.queryExecution.explainString(FormattedMode)
    // the corpus meets only the broadcast 8-query side; pool-pool sims
    // and the greedy fold must never trigger a corpus-sized product
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("dq report: row-level checks fold into one aggregate pass") {
    val p = plan("q_dq_report")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // 7 row-level checks over lineitem must NOT mean 7 scans: one scan
    // feeds the shared aggregate; the extra scans are the unique-key
    // pass and the referential branches (keys + shared total)
    val liScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(liScans <= 5, s"expected <=5 lineitem scans, got $liScans")
    assert(!p.contains("SortMergeJoin"),
      "referential anti-join degraded to SMJ at dim scale")
  }

  test("weighted sample: prefix sums bucket-partitioned, offsets broadcast") {
    val p = plan("q_sample_weighted")
    // the data-sized window must partition by bucket — the only
    // unpartitioned window tolerated is over the per-bucket totals
    // (metadata-sized); offsets re-attach via broadcast, never SMJ
    val dataWindows = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition")).toList
    assert(dataWindows.exists(_.contains("bucket#")),
      s"no bucket-partitioned window:\n${dataWindows.mkString("\n")}")
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("preference pairs: argmax/argmin are aggregates, not windows") {
    val p = plan("q_pref_pairs")
    val windows = p.linesIterator.count(l =>
      l.trim.startsWith("Window") || l.contains("(Window"))
    assert(windows === 0, s"stratum window in plan:\n${p.take(2000)}")
    // struct-typed min/max compile to SortAggregate — still partial
    // (pre-exchange) + final, i.e. map-side combined
    assert("(Hash|Sort)Aggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("Join"), "pairing should be one aggregate, no join")
  }

  test("containment: inverted-index equi-join, never a product") {
    val p = plan("q_dedup_containment")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("pagerank: supersteps are equi-joins + aggregates, no products") {
    val p = plan("q_graph_pagerank")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // a window anywhere in the rank loop would funnel a superstep
    assert(p.linesIterator.count(l => l.trim.startsWith("Window")) === 0,
      p.take(3000))
  }

  test("rankcorr: global ranks are range-sorts, not one-task windows") {
    val p = plan("q_eval_rankcorr")
    assert(p.linesIterator.count(l => l.trim.startsWith("Window")) === 0,
      s"corpus-wide window in plan:\n${p.take(3000)}")
    assert(p.contains("Sort"), "expected range-partitioned sorts")
  }

  test("curriculum: global order is a range sort, position not a window") {
    val p = plan("q_curriculum")
    assert(p.linesIterator.count(l => l.trim.startsWith("Window")) === 0,
      s"corpus-wide window in plan:\n${p.take(3000)}")
  }

  test("triangle census: oriented wedge joins are equi-joins, no product") {
    val p = plan("q_graph_triangles")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("image phash near-dup: band equi-join, never an image product") {
    val p = plan("q_mm_phash_dups")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("bigram LM: model join is an equi-join; vocab total is a 1-row broadcast") {
    val p = plan("q_text_lm_score")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("dsir: B-row bucket model broadcasts back onto the gram stream") {
    val p = plan("q_curation_dsir")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"model join degraded to SMJ only:\n${p.take(3000)}")
  }

  test("blocklist and char-hhi are pure projections: zero data shuffle") {
    Seq("q_text_blocklist", "q_text_char_hhi").foreach { q =>
      val p = plan(q)
      assert(!p.contains("hashpartitioning") && !p.contains("SortMergeJoin") &&
        !p.contains("HashAggregate"),
        s"$q gained a shuffle:\n${p.take(3000)}")
    }
  }

  test("k-center: final lineage is checkpoint-truncated (constant in k)") {
    val p = plan("q_select_kcenter")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("ExistingRDD"), p.take(2000))
  }

  test("hard negatives: anchors broadcast; corpus never self-joins") {
    val p = plan("q_sim_hard_negatives")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("class margins: pairs stay label²; centroid pass checkpoint-truncated") {
    val p = plan("q_emb_class_margins")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p.take(3000))
    // the centroid aggregate ran once into the localCheckpoint; the pair
    // join reads the |labels|-row RDD twice instead of re-aggregating
    assert(p.contains("ExistingRDD"), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
  }

  test("ttr: single aggregate pass, no join") {
    val p = plan("q_text_ttr")
    assert(!p.contains("Join"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("dsir frozen face: ratio table + default broadcast, no product") {
    val p = plan("q_curation_dsir_freeze")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
  }

  test("shard assignment: distributed rank, never a one-task window") {
    val p = plan("q_curation_shards")
    assert(!p.linesIterator.exists(_.trim.startsWith("Window")),
      s"corpus-wide window:\n${p.take(3000)}")
    assert(p.contains("ExistingRDD"), p.take(2000))
  }

  test("bitext mining: broadcast scoring passes, never a product or spill") {
    val p = plan("q_sim_bitext")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the candidate stream recomputes per pass (no corpus-sized
    // checkpoint — the sf1 OOM lesson); each pass is src-broadcast
    assert(p.contains("BroadcastExchange"), p.take(3000))
  }

  test("PII redaction runs at scan speed: no keyed shuffle, zero joins") {
    val p = plan("q_privacy_redact")
    // the only allowed exchange is the conditional round-robin widen of
    // the single-split test corpus — never a keyed repartition
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("l-diversity: one aggregate pass, class-sized output") {
    val p = plan("q_privacy_ldiv")
    assert(!p.contains("Join"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("ngram-overlap grader: pair-bounded joins, never a product") {
    val p = plan("q_eval_ngram_overlap")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("fleiss kappa: one unpivot pass to aggregates, 1-row broadcasts only") {
    val p = plan("q_eval_fleiss")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
    // the only cross is the S1 × S2 1-row combine (J3 shape)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(3000))
  }

  test("self-bleu: bucket-sample pairs only, never corpus pairs") {
    val p = plan("q_eval_self_bleu")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("rouge-l: the LCS DP rides inside the pair projection, no product") {
    val p = plan("q_eval_rouge_l")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the whole dynamic program is per-row array work — no extra
    // shuffle beyond the two pair-index equi-joins
    assert(!p.contains("Exchange rangepartitioning"), p.take(3000))
  }

  test("k-anonymity: one partial+final aggregate, output is class-sized") {
    val p = plan("q_privacy_kanon")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"lost the map-side combine:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("skipgram: pure generate → map-side-combined count, zero joins") {
    val p = plan("q_text_skipgram")
    assert(!p.contains("Join"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("PMI: vocab-keyed equi-joins only; totals are 1-row broadcasts") {
    val p = plan("q_text_pmi")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the two unigram attachments must be equi-joins (hash or sort-merge),
    // never a product; the N_u/N_b totals ride as broadcast 1-rows
    assert(p.contains("BroadcastExchange"), p.take(3000))
  }

  test("chi2: corpus reduces to the facet grid before any cross") {
    val p = plan("q_stats_chi2")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("record linkage: candidates come from the blocking equi-join") {
    val p = plan("q_link_records")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("portable HLL: shuffle carries registers, not values") {
    val p = plan("q_sketch_hll")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // register build must be partial+final (map-side max before exchange)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("script profile is a pure projection: zero data shuffle") {
    val p = plan("q_text_scripts")
    assert(!p.contains("hashpartitioning") && !p.contains("SortMergeJoin") &&
      !p.contains("HashAggregate"), s"gained a shuffle:\n${p.take(3000)}")
  }

  test("correlation matrix: ONE aggregate pass feeds the pair explosion") {
    val p = plan("q_stats_corr")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // one partial+final global aggregate — the scan must appear once
    assert("Scan parquet".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("group regression: map-side-combined sufficient statistics") {
    val p = plan("q_stats_regression")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("benford: digit counts reduce before the 1-row total broadcast") {
    val p = plan("q_stats_benford")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("scene cuts: frame window partitions by media, no product") {
    val p = plan("q_mm_scenecut")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the lag window must partition by media_id, never run globally
    assert(p.contains("media_id"), p.take(3000))
  }

  test("unigram tokenize: broadcast vocab join, distinct-word DP, no product") {
    val p = plan("q_text_unigram")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the vocabulary side must broadcast into the candidate join —
    // shuffling corpus substrings against a KB-sized piece table would
    // be the 100 TB mistake. (The final per-doc rejoin is doc_id ⋈
    // doc_id between two corpus-sized relations — sort-merge is the
    // RIGHT shape there, so only the vocab join is pinned.)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("wordpiece tokenize shares the unigram plan shape") {
    val p = plan("q_text_wordpiece")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("indexed semantic decontamination: probed cells push into the codes scan") {
    val p = plan("q_decontam_semantic_indexed")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the probed-cell list collects and pushes as an IN filter over the
    // cell-clustered codes table — the pruning that makes IVF an index
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(cell")), p.take(4000))
  }

  test("trigram KN: type-keyed equi-joins only; the global type count broadcasts") {
    val p = plan("q_text_lm_kn3")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // N1+(··) is a 1-row aggregate crossed in as a broadcast — never a
    // shuffled product; every other model join is a vocab-keyed equi-join
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(3000))
    // the scoring join + per-doc mean keep partial/final aggregation
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("matryoshka recall: both arms broadcast the 8-query side") {
    val p = plan("q_sim_matryoshka_recall")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // corpus × queries runs as a broadcast nested-loop over the tiny
    // query side in each arm, never a shuffled product
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2, p.take(3000))
  }
}
