package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain edge-list DataFrames — the
  * Pregel-shaped face of the engine, expressed as per-iteration
  * join + groupBy passes so Catalyst plans each superstep as two
  * key-partitioned shuffles over (id, long) pairs. No vertex-program
  * runtime: for the bounded iteration counts these analyses use
  * (centrality over a near-dup graph stabilizes in a handful of rounds)
  * a loop of declarative passes is simpler and AQE-replannable.
  *
  * All rank arithmetic is exact integer floor-division on non-negative
  * values, so Spark and the DuckDB oracle (which unrolls the identical
  * iterations as CTEs) agree bit-for-bit — no float accumulation whose
  * result depends on reduction order.
  */
object Graph {

  /** Exact ⌊num/den⌋ for non-negative integral columns, overflow-safe:
    * the quotient is computed in decimal(38,0) (sums of per-edge
    * contributions can exceed the 2⁵³ double-exact window at corpus
    * scale, so a float detour is not an option). */
  private def fdiv(num: Column, den: Column): Column =
    floor(num.cast("decimal(38,0)") / den.cast("decimal(38,0)")).cast("long")

  /** PageRank over a directed `edges(src, dst)` list on the integer rank
    * lattice: ranks start at `scale`, and each iteration computes
    *
    *   r'(v) = ⌊scale·(100−damp)/100⌋ + ⌊damp · Σ_{u→v} ⌊r(u)/deg(u)⌋ / 100⌋
    *
    * Dangling-node mass is dropped (the standard simplified formulation);
    * isolated nodes keep the base rank. Over a symmetrized near-dup pair
    * graph this surfaces template/boilerplate hubs: documents whose text
    * recurs across many near-copies accumulate rank from every copy.
    *
    * Scale: one hash join (edges ⋈ ranks on src) and one groupBy(dst) per
    * iteration — the message pass of a Pregel superstep as two shuffles
    * that carry only (BIGINT id, BIGINT rank); text never moves. The
    * out-degree join is done ONCE up front and the (src, dst, deg) edge
    * list is eagerly localCheckpoint-ed: every iteration re-reads the
    * materialized blocks instead of re-deriving degrees, and the plan fed
    * to iteration k does not nest iteration k−1's shuffle lineage under a
    * re-computed degree aggregation. Node ids are checkpointed for the
    * same reason (they appear in every iteration's left join).
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      damp: Int = 85, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    require(damp >= 0 && damp <= 100, "pageRank: damp is a percentage")
    val ids = nodes.select(col(nodes.columns.head).as("id"))
      .localCheckpoint(true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint(true)
    val base = scale * (100 - damp) / 100
    var ranks = ids.select(col("id"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), fdiv(col("rank"), col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      // damp·s must leave int64 BEFORE the product: s is bounded by the
      // total rank mass (~n·scale), so 85·s wraps around n≈1e11 docs if
      // multiplied as longs. Cast to decimal(38,0) first; fdiv then
      // floor-divides in the same lattice.
      ranks = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + fdiv(lit(damp.toLong).cast("decimal(38,0)") *
            coalesce(col("s"), lit(0L)), lit(100L))).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** HITS hubs-and-authorities over a DIRECTED edge list, on the same
    * exact integer lattice: per iteration, authority(v) = Σ_{u→v} hub(u)
    * and hub(v) = Σ_{v→u} auth(u), each renormalized so the maximum is
    * `scale` (⌊x·scale/max⌋ — the float L2 norm of the textbook
    * formulation would be engine-dependent; max-normalization keeps the
    * fixed point and is exact). Over an id-ordered near-dup pair graph
    * (old doc → newer copy), hubs are the much-copied ORIGINALS and
    * authorities the accumulating COPIES.
    *
    * Scale: two equi-join + groupBy passes per iteration over (id, long)
    * pairs; the per-step max is a 1-row aggregate broadcast back — no
    * corpus-wide window, no product. */
  def hits(nodes: DataFrame, edges: DataFrame, iters: Int = 2,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "hits: iters must be >= 1")
    val ids = nodes.select(col(nodes.columns.head).as("id"))
      .localCheckpoint(true)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    // `raw` is referenced twice below (the 1-row max and the left join);
    // checkpointing it first means the aggregate subtree is computed
    // once and — critically — the per-iteration lineage stays CONSTANT
    // depth instead of ~4×-ing per iteration (each un-checkpointed
    // normalized() would re-embed the previous iteration's whole plan
    // twice). Same discipline labelPropagation applies to `cur`.
    // The v·scale product leaves int64 BEFORE multiplying: raw sums
    // reach scale·indegree, so v·1000000 wraps as a long once a hub's
    // in-degree exceeds ~9.2e6 — plausible for boilerplate hubs.
    def normalized(rawPlan: DataFrame, vCol: String): DataFrame = {
      val raw = rawPlan.localCheckpoint(true)
      val mx = raw.agg(max(col(vCol)).as("mx"))
      ids.join(raw, Seq("id"), "left").crossJoin(broadcast(mx))
        .select(col("id"),
          when(col("mx") > 0,
            fdiv(coalesce(col(vCol), lit(0L)).cast("decimal(38,0)") *
              lit(scale), col("mx")))
            .otherwise(lit(0L)).as(vCol))
    }
    var hub = ids.select(col("id"), lit(scale).as("hub"))
    var auth = ids.select(col("id"), lit(0L).as("auth"))
    for (_ <- 1 to iters) {
      auth = normalized(
        e.join(hub.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("auth")),
        "auth")
      hub = normalized(
        e.join(auth.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id")).agg(sum(col("auth")).as("hub")),
        "hub")
    }
    hub.join(auth, Seq("id"))
  }

  /** Label propagation for graph-based weak supervision: seed nodes keep
    * their label; each round, an unlabeled node adopts the MAJORITY
    * label among its labeled in-neighbors (count desc, label asc on
    * ties — deterministic). `seeds` carries (id, label); nodes absent
    * from it start unlabeled. Rounds are monotone (labels only appear,
    * never change), so the result is exact regardless of execution
    * order.
    *
    * Scale: per round one equi-join (edges ⋈ labeled on src) + one
    * (dst, label) count aggregate + one struct-min argmax aggregate —
    * the majority vote is an AGGREGATE, never a per-node window. */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      seeds: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, "labelPropagation: iters must be >= 1")
    val ids = nodes.select(col(nodes.columns.head).as("id"))
      .localCheckpoint(true)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val seeded = ids.join(
      seeds.select(col(seeds.columns.head).as("id"),
        col(seeds.columns(1)).as("lbl")), Seq("id"), "left")
      .select(col("id"), col("lbl"),
        col("lbl").isNotNull.as("is_seed"))
    var cur = seeded.localCheckpoint(true)
    for (_ <- 1 to iters) {
      val votes = e
        .join(cur.filter(col("lbl").isNotNull)
          .select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("id"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l")))
          .as("top"))
        .select(col("id"), col("top.l").as("vote"))
      cur = cur.join(votes, Seq("id"), "left")
        .select(col("id"), coalesce(col("lbl"), col("vote")).as("lbl"),
          col("is_seed"))
        .localCheckpoint(true)
    }
    cur.select(col("id"), col("lbl"),
      when(col("is_seed"), lit("seed"))
        .when(col("lbl").isNotNull, lit("propagated"))
        .otherwise(lit("none")).as("origin"))
  }
}
