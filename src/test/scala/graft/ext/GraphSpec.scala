package graft.ext

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] =
    Graph.pageRank(nodes.toDF("doc_id"), edges.toDF("src", "dst"),
        iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one iteration matches hand-computed integer lattice values") {
    // 1 -> 3, 2 -> 3 (deg 1 each), 3 -> 1 (deg 1); node 4 isolated
    val r = ranksOf(Seq(1L, 2L, 3L, 4L), Seq((1L, 3L), (2L, 3L), (3L, 1L)), 1)
    // r'(3) = 150000 + (85 * (1000000 + 1000000)) / 100 = 1850000
    assert(r(3L) === 150000L + 85L * 2000000L / 100L)
    // r'(1) = 150000 + (85 * 1000000) / 100 = 1000000
    assert(r(1L) === 150000L + 85L * 1000000L / 100L)
    // no in-edges -> base rank; isolated -> base rank
    assert(r(2L) === 150000L)
    assert(r(4L) === 150000L)
  }

  test("degree split floors exactly and dangling mass is dropped") {
    // 1 -> {2, 3}: each successor gets floor(1000000 / 2); 2 and 3 dangle
    val r = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (1L, 3L)), 1)
    assert(r(2L) === 150000L + 85L * 500000L / 100L)
    assert(r(2L) === r(3L))
    assert(r(1L) === 150000L)
  }

  test("iterations compose: second round consumes first-round ranks") {
    // 2-cycle: 1 <-> 2 stays symmetric at every iteration and converges
    // toward scale; 3 feeds 1 once then dangles
    val r1 = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L), (3L, 1L)), 1)
    val r2 = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L), (3L, 1L)), 2)
    // iter 1: r(1) = 150000 + 85*(1000000 + 1000000)/100 = 1850000
    assert(r1(1L) === 1850000L)
    // iter 2: r(2) = 150000 + 85*1850000/100 = 1722500 (3's mass decayed)
    assert(r2(2L) === 150000L + 85L * 1850000L / 100L)
    // the cycle peers see each other's PREVIOUS rank, not the updated one
    assert(r2(1L) === 150000L + 85L * (1000000L + 150000L) / 100L)
  }

  test("hits: star graph — center is the authority, leaves the hubs") {
    // 1,2,3 all point at 4
    val r = Graph.hits(Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id"),
        Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("src", "dst"), iters = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    // auth: only 4 receives (3·1e6 raw) → normalized 1e6; hub: each
    // leaf's raw = auth(4) = 1e6, max-normalized to 1e6
    assert(r(4L) === ((0L, 1000000L)))
    assert(r(1L) === ((1000000L, 0L)))
    assert(r(1L) === r(2L) && r(2L) === r(3L))
    assert(r(5L) === ((0L, 0L))) // isolated: no in- or out-edges
  }

  test("hits: unequal in-degrees normalize against the max") {
    // 1→3, 2→3, 1→4: auth raw 3: 2e6, 4: 1e6 → 1e6 and 500000
    val r = Graph.hits(Seq(1L, 2L, 3L, 4L).toDF("doc_id"),
        Seq((1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst"), iters = 1)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    assert(r(3L)._2 === 1000000L)
    assert(r(4L)._2 === 500000L)
    // hub raw: 1 → auth(3)+auth(4) = 1.5e6 (max), 2 → 1e6 → 666666
    assert(r(1L)._1 === 1000000L)
    assert(r(2L)._1 === 666666L)
  }

  test("hits/pageRank: per-iteration checkpoints keep the final plan " +
      "constant in iters (VERDICT r11 #1 — was 86 exchanges at iters=2)") {
    val nodes = (1L to 6L).toDF("doc_id")
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("src", "dst")
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)).size
    val h2 = exchanges(Graph.hits(nodes, e, iters = 2))
    val h4 = exchanges(Graph.hits(nodes, e, iters = 4))
    assert(h2 === h4, s"hits plan grows with iters: $h2 -> $h4")
    // the constant is the last hub/auth normalization pair + final join
    // (measured 16; was 86 and ~4×/iter before the checkpoints)
    assert(h2 <= 18, s"hits final plan carries $h2 exchanges")
    val p2 = exchanges(Graph.pageRank(nodes, e, iters = 2))
    val p4 = exchanges(Graph.pageRank(nodes, e, iters = 4))
    assert(p2 === p4, s"pageRank plan grows with iters: $p2 -> $p4")
  }

  test("kCore: per-round checkpoints keep the final plan constant in " +
      "rounds (VERDICT r12 #7 — the one iterative op without a pin)") {
    val nodes = (1L to 6L).toDF("doc_id")
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("src", "dst")
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)).size
    val k2 = exchanges(Graph.kCore(nodes, e, k = 2, rounds = 2))
    val k5 = exchanges(Graph.kCore(nodes, e, k = 2, rounds = 5))
    assert(k2 === k5, s"kCore plan grows with rounds: $k2 -> $k5")
    // constant = the final degree aggregation + the two output joins
    // over checkpointed inputs
    assert(k2 <= 12, s"kCore final plan carries $k2 exchanges")
  }

  test("hits: in-degree at the long-wrap boundary normalizes exactly " +
      "(decimal product, ADVICE r11)") {
    // raw auth = hub·indeg = 1e6·2e4 = 2e10; ×scale as a LONG would be
    // 2e16 (fine) — but the REGRESSION bound is the contract: the
    // product runs in decimal(38,0), so even indeg ≈ 1e13 can't wrap.
    // Verify the lattice stays exact on a wide star (hand-checkable).
    val n = 200
    val nodes = (0L to n.toLong).toDF("doc_id")
    val e = (1 to n).map(i => (i.toLong, 0L)).toDF("src", "dst")
    val r = Graph.hits(nodes, e, iters = 1)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    assert(r(0L)._2 === 1000000L)       // sole authority, normalized max
    assert(r(1L)._1 === 1000000L)       // every leaf an equal hub
    assert(r(0L)._1 === 0L)
  }

  test("triangles: cliques count, stars don't, lcc on the frac4 lattice") {
    // square 1-2-3-4 with diagonal 1-3 → triangles (1,2,3) and (1,3,4);
    // star 10-{11,12,13} has wedges but no closures; 20 isolated
    val nodes = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 20L)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L),
      (10L, 11L), (10L, 12L), (10L, 13L)).toDF("id_a", "id_b")
    val r = Graph.triangles(nodes, pairs)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) === ((3L, 2L, 0.6666))) // 2·2·10⁴/(3·2) floored
    assert(r(3L) === ((3L, 2L, 0.6666)))
    assert(r(2L) === ((2L, 1L, 1.0)))
    assert(r(4L) === ((2L, 1L, 1.0)))
    assert(r(10L) === ((3L, 0L, 0.0))) // hub: all wedges, no closures
    assert(r(11L) === ((1L, 0L, 0.0)))
    assert(r(20L) === ((0L, 0L, 0.0)))
  }

  test("kCore: triangle survives 2-core, tail peels over rounds") {
    // triangle 1-2-3 (the 2-core) + path tail 3-4-5 + isolated 6:
    // round 1 peels 5 (deg 1), round 2 peels 4 (deg fell to 1),
    // round 3 is the fixpoint
    val nodes = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val r = Graph.kCore(nodes, pairs, k = 2, rounds = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    assert(r(1L) === ((1L, 2L)))
    assert(r(2L) === ((1L, 2L)))
    assert(r(3L) === ((1L, 2L)))
    assert(r(4L) === ((0L, 0L)))
    assert(r(5L) === ((0L, 0L)))
    assert(r(6L) === ((0L, 0L)))
    // rounds short of the fixpoint: after ONE round only 5 is gone;
    // 4 remains flagged with its post-restriction degree 1 (< k,
    // documented over-approximation)
    val r1 = Graph.kCore(nodes, pairs, k = 2, rounds = 1)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    assert(r1(4L) === ((1L, 1L)))
    assert(r1(5L) === ((0L, 0L)))
  }

  test("triangles: reversed and duplicate input pairs canonicalize") {
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    // K3 given with duplicates, reversals, and a self-loop to drop
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L)).toDF("id_a", "id_b")
    val r = Graph.triangles(nodes, pairs)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r === Map(1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((2L, 1L, 1.0))))
  }

  test("label propagation: majority vote with deterministic tie rule") {
    // seeds: 1=a, 2=b, 3=b; node 4 hears {a, b, b} → b; node 5 hears
    // {a, b} → tie → label asc → a; node 6 unreachable stays none
    val nodes = (1L to 6L).toDF("doc_id")
    val e = Seq((1L, 4L), (2L, 4L), (3L, 4L), (1L, 5L), (2L, 5L))
      .toDF("src", "dst")
    val seeds = Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("id", "label")
    val r = Graph.labelPropagation(nodes, e, seeds, iters = 1)
      .collect().map(x => x.getLong(0) ->
        ((Option(x.getString(1)), x.getString(2)))).toMap
    assert(r(4L) === ((Some("b"), "propagated")))
    assert(r(5L) === ((Some("a"), "propagated")))
    assert(r(6L) === ((None, "none")))
    assert(r(1L) === ((Some("a"), "seed")))
  }

  test("label propagation: labels reach distance 2 in round 2, seeds never flip") {
    // chain 1(seed a) → 2 → 3; 2 also seeded b: seed wins over vote
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = Graph.labelPropagation(nodes, e,
        Seq((1L, "a")).toDF("id", "label"), iters = 1)
      .collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(r1(3L) === None) // distance 2 not reached in one round
    val r2 = Graph.labelPropagation(nodes, e,
        Seq((1L, "a")).toDF("id", "label"), iters = 2)
      .collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(r2(2L) === Some("a") && r2(3L) === Some("a"))
    val seeded = Graph.labelPropagation(nodes, e,
        Seq((1L, "a"), (2L, "b")).toDF("id", "label"), iters = 2)
      .collect().map(x => x.getLong(0) ->
        ((Option(x.getString(1)), x.getString(2)))).toMap
    assert(seeded(2L) === ((Some("b"), "seed"))) // vote never flips a seed
    assert(seeded(3L) === ((Some("b"), "propagated")))
  }

  test("hub in a symmetrized near-dup clique outranks isolated nodes") {
    // 1-2-3 all mutual near-dups (symmetrized clique), 4..9 isolated
    val clique = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
    val r = ranksOf((1L to 9L), clique, 3)
    assert(Seq(1L, 2L, 3L).map(r).distinct.size === 1) // symmetry
    assert(r(1L) > r(5L))
    assert((4L to 9L).map(r).toSet.size === 1)
  }
}
