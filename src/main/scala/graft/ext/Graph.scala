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

  /** Triangle counts + local clustering coefficient over an UNDIRECTED
    * pair graph (e.g. the MinHash near-dup pairs): for a near-dup
    * graph, triangle density separates tight template cliques (every
    * copy resembles every other — high coefficient) from hub-and-spoke
    * shapes (one boilerplate fragment shared pairwise — low), the
    * readout that decides whether to collapse a cluster wholesale or
    * keep its members.
    *
    * Algorithm: degree orientation (Suri & Vassilvitskii, WWW 2011 —
    * "the curse of the last reducer"): orient every edge from the
    * lower (deg, id) endpoint to the higher, enumerate wedges only
    * from each vertex's ORIENTED out-neighbors, and close them
    * against the oriented edge set. Out-degree under this orientation
    * is O(√m) regardless of raw degree, so a 10⁷-degree boilerplate
    * hub contributes O(m) wedges, not 10¹⁴ — wedge volume is bounded
    * by Σ outdeg² ≤ m^1.5 corpus-wide. All joins are equi-joins on
    * vertex ids; counts are exact integers.
    *
    * Output: (id, deg, tri, lcc) per node — lcc = ⌊2·tri·10⁴ /
    * (deg·(deg−1))⌋/10⁴ on the frac4 lattice, 0.0 for deg < 2. */
  def triangles(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val ids = nodes.select(col(nodes.columns.head).as("id"))
      .localCheckpoint(true)
    // e is referenced twice (degree count + orientation join) — without
    // the checkpoint the whole upstream pair chain would run twice
    val e = pairs
      .select(col(pairs.columns.head).as("u"), col(pairs.columns(1)).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val withDeg = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
    val lt = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // oriented edge src→dst with dst's (deg, id) rank carried for the
    // wedge ordering (the closing edge is then oriented a.dst→b.dst)
    val o = withDeg.select(
        when(lt, col("u")).otherwise(col("v")).as("src"),
        when(lt, col("v")).otherwise(col("u")).as("dst"),
        when(lt, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint(true)
    val tri = o.as("a").join(o.as("b"),
        col("a.src") === col("b.src") &&
          (col("a.ddst") < col("b.ddst") ||
            (col("a.ddst") === col("b.ddst") &&
              col("a.dst") < col("b.dst"))))
      .select(col("a.src").as("t1"), col("a.dst").as("t2"),
        col("b.dst").as("t3"))
      .join(o.select(col("src").as("t2"), col("dst").as("t3")),
        Seq("t2", "t3"), "left_semi")
    val cnt = tri.select(col("t1").as("id"))
      .unionAll(tri.select(col("t2").as("id")))
      .unionAll(tri.select(col("t3").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("tri"))
    ids.join(deg, Seq("id"), "left").join(cnt, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .select(col("id"), col("deg"), col("tri"), {
        val num = lit(2L) * col("tri") * lit(10000L)
        val den = col("deg") * (col("deg") - lit(1L))
        when(col("deg") >= 2L,
          ((num - pmod(num, den)) / den).cast("double") / 10000.0)
          .otherwise(lit(0.0)).as("lcc")
      })
  }

  /** k-core peel over an UNDIRECTED pair graph: repeatedly drop
    * vertices whose degree in the SURVIVING subgraph is < k. The
    * k-core of a near-dup graph is the dense boilerplate nucleus —
    * documents that stay mutually entangled even after their weakly
    * attached neighbors peel away — the set a curation pass quarantines
    * wholesale, where triangles/lcc only score it.
    *
    * `rounds` bounds the peel (the true k-core is the fixpoint; the
    * sequence is monotone — vertices only ever leave — so R rounds is
    * a sound OVER-approximation that equals the fixpoint once no drop
    * occurs; near-dup graphs settle in a handful of rounds). Output:
    * (id, in_core, core_deg) for every node — core_deg the degree
    * inside the surviving subgraph after the last peel, 0 outside.
    *
    * Scale: each round is one degree aggregate + two semi-joins over
    * (id, id) pairs, checkpointed — plan depth constant per round,
    * shuffles carry only vertex ids; never a product. */
  def kCore(nodes: DataFrame, pairs: DataFrame, k: Int = 2,
      rounds: Int = 3): DataFrame = {
    require(k >= 1, "kCore: k must be >= 1")
    require(rounds >= 1, "kCore: rounds must be >= 1")
    val ids = nodes.select(col(nodes.columns.head).as("id"))
      .localCheckpoint(true)
    var e = pairs
      .select(col(pairs.columns.head).as("u"), col(pairs.columns(1)).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)
    def degOf(ed: DataFrame): DataFrame =
      ed.select(col("u").as("id")).unionAll(ed.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    var keep = ids
    for (_ <- 1 to rounds) {
      keep = degOf(e).filter(col("deg") >= k)
        .select(col("id")).localCheckpoint(true)
      e = e
        .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
    }
    // survivors = the last round's keep set; core_deg = degree inside
    // the surviving subgraph (can sit below k only when `rounds`
    // stopped short of the fixpoint — by monotonicity another round
    // would peel exactly those vertices)
    ids
      .join(keep.select(col("id"), lit(1L).as("ic")), Seq("id"), "left")
      .join(degOf(e), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("ic"), lit(0L)).as("in_core"),
        when(col("ic").isNotNull, coalesce(col("deg"), lit(0L)))
          .otherwise(lit(0L)).as("core_deg"))
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
