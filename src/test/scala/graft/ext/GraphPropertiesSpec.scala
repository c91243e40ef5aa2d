package graft.ext

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec

/** ScalaCheck properties for the iterative-graph lattice invariants —
  * executed instead of trusted, over random small digraphs:
  *
  * - PageRank: every rank ≥ the base term, total rank mass never
  *   exceeds n·scale (floor division and dropped dangling mass only
  *   shrink it), and the computation is a pure function of the graph
  *   (replay-identical — the determinism the oracle hash-compare
  *   depends on).
  * - HITS: every score lands in [0, scale] and max-normalization is
  *   exact — whenever any raw score is positive, the maximum after
  *   normalization is EXACTLY scale ((mx·scale)//mx = scale).
  * - Label propagation: seeds never flip, every propagated label is
  *   some seed's label, and one more round only grows the labeled set
  *   (monotonicity — what makes replay idempotent).
  * - Spearman: ρ ∈ [−1, 1] and invariance under any strictly
  *   increasing transform of either score column (ranks see order
  *   only).
  */
class GraphPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val genGraph: Gen[(Seq[Long], Seq[(Long, Long)])] = for {
    n <- Gen.choose(2, 7)
    nodes = (1L to n.toLong)
    all = for { a <- nodes; b <- nodes if a != b } yield (a, b)
    edges <- Gen.someOf(all)
  } yield (nodes, edges.toSeq)

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("pageRank: base floor, bounded mass, replay-identical") {
    check(Prop.forAll(genGraph) { case (nodes, edges) =>
      val run = () => Graph.pageRank(nodes.toDF("doc_id"),
          edges.toDF("src", "dst"), iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val r = run()
      r.size == nodes.size &&
        r.values.forall(_ >= 150000L) &&
        r.values.sum <= nodes.size * 1000000L &&
        run() == r
    })
  }

  test("hits: scores in [0, scale]; normalization max is exactly scale") {
    check(Prop.forAll(genGraph) { case (nodes, edges) =>
      val r = Graph.hits(nodes.toDF("doc_id"), edges.toDF("src", "dst"),
          iters = 2)
        .collect().map(x => (x.getLong(1), x.getLong(2)))
      val bounded = r.forall { case (h, a) =>
        h >= 0L && h <= 1000000L && a >= 0L && a <= 1000000L }
      // any edge ⇒ some positive raw auth in round 1 and (since auth
      // max is scale) some positive raw hub — both normalize to scale
      val maxed = edges.isEmpty ||
        (r.map(_._1).max == 1000000L && r.map(_._2).max == 1000000L)
      bounded && maxed
    })
  }

  test("label propagation: seeds fixed, labels from seeds, monotone rounds") {
    val genSeeded = for {
      g <- genGraph
      seedIds <- Gen.someOf(g._1)
      lbls <- Gen.listOfN(seedIds.size, Gen.oneOf("a", "b", "c"))
    } yield (g._1, g._2, seedIds.toSeq.zip(lbls))
    check(Prop.forAll(genSeeded) { case (nodes, edges, seeds) =>
      def run(k: Int) = Graph.labelPropagation(nodes.toDF("doc_id"),
          edges.toDF("src", "dst"), seeds.toDF("id", "label"), iters = k)
        .collect().map(r => r.getLong(0) ->
          ((Option(r.getString(1)), r.getString(2)))).toMap
      val r1 = run(1)
      val r2 = run(2)
      val seedMap = seeds.toMap
      val seedsFixed = seeds.forall { case (id, l) =>
        r1(id) == ((Some(l), "seed")) && r2(id) == ((Some(l), "seed")) }
      val fromSeeds = (r1.values ++ r2.values)
        .forall { case (l, _) => l.forall(seedMap.values.toSet) }
      // once labeled, a node's label is FIXED (coalesce keeps the old
      // label) — round 2 may only add labels, never change one
      val monotone = nodes.forall { id =>
        r1(id)._1.forall(l1 => r2(id)._1.contains(l1))
      }
      seedsFixed && fromSeeds && monotone
    })
  }

  test("triangles: counts match the brute-force census on random graphs") {
    check(Prop.forAll(genGraph) { case (nodes, edges) =>
      // undirected view of the random digraph, self-loop-free
      val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val brute = nodes.map { v =>
        val nb = adj.getOrElse(v, Set.empty).toSeq
        v -> (for {
          i <- nb.indices; j <- (i + 1) until nb.size
          if adj(nb(i)).contains(nb(j))
        } yield 1).size.toLong
      }.toMap
      val got = Graph.triangles(nodes.toDF("doc_id"),
          edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      nodes.forall(v => got(v) == brute(v))
    })
  }

  test("kCore: at the fixpoint every survivor has core degree >= k " +
      "and re-peeling is a no-op") {
    check(Prop.forAll(genGraph) { case (nodes, edges) =>
      // rounds = n always reaches the fixpoint (each non-final round
      // removes at least one vertex)
      val r = Graph.kCore(nodes.toDF("doc_id"),
          edges.toDF("id_a", "id_b"), k = 2, rounds = nodes.size)
        .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
        .toMap
      val coreOk = r.values.forall { case (ic, d) =>
        if (ic == 1L) d >= 2L else d == 0L }
      // survivors induce a subgraph where the peel finds nothing to do:
      // one more round over the surviving edges keeps everyone
      val survivors = r.collect { case (id, (1L, _)) => id }.toSet
      val survEdges = edges
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
        .filter { case (a, b) =>
          a != b && survivors(a) && survivors(b) }
      val again =
        if (survivors.isEmpty) Map.empty[Long, (Long, Long)]
        else Graph.kCore(survivors.toSeq.toDF("doc_id"),
          survEdges.toDF("id_a", "id_b"), k = 2, rounds = 1)
          .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
          .toMap
      coreOk && survivors.forall(id => again(id) == r(id))
    })
  }

  test("spearman: rho in [-1,1], invariant under monotone transforms") {
    val genScores = for {
      n <- Gen.choose(1, 12)
      as <- Gen.listOfN(n, Gen.choose(-50L, 50L))
      bs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield (1L to n.toLong).zip(as.zip(bs))
      .map { case (id, (a, b)) => (id, a, b) }
    check(Prop.forAll(genScores) { rows =>
      def rho(rs: Seq[(Long, Long, Long)]) =
        Eval.spearman(rs.toDF("id", "a", "b"), "id", "a", "b")
          .collect().head.getDouble(2)
      val base = rho(rows)
      // 2x+7 is strictly increasing; ranks — and rho — cannot move.
      // (The id tiebreak only fires on equal scores, and equality is
      // preserved by the affine map.)
      val scaled = rho(rows.map { case (i, a, b) => (i, 2 * a + 7, b) })
      base >= -1.0 && base <= 1.0 && scaled == base
    })
  }
}
