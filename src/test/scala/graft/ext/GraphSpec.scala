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

  test("hub in a symmetrized near-dup clique outranks isolated nodes") {
    // 1-2-3 all mutual near-dups (symmetrized clique), 4..9 isolated
    val clique = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
    val r = ranksOf((1L to 9L), clique, 3)
    assert(Seq(1L, 2L, 3L).map(r).distinct.size === 1) // symmetry
    assert(r(1L) > r(5L))
    assert((4L to 9L).map(r).toSet.size === 1)
  }
}
