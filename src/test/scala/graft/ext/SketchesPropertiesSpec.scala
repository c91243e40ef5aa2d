package graft.ext

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec

/** ScalaCheck properties for the KMV distinct sketch: for ANY multiset
  * of (group, value) observations and ANY way of splitting it into
  * shards —
  *   1. merging shard keep-sets (k-min of the union of keeps) yields the
  *      same profile as sketching the whole dataset — the property that
  *      makes partial sketches from corpus shards combinable;
  *   2. duplicated observations never change the sketch (fold
  *      idempotence — what makes replayed micro-batches harmless);
  *   3. under k distinct values the estimate IS the exact count.
  */
class SketchesPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8

  private val genRows: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 40L)
    } yield (g, v))
  } yield rows

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  private def profile(rows: Seq[(String, Long)]): Set[(String, Long, Long, Double)] =
    Sketches.kmvDistinct(rows.toDF("g", "v"), "g", "v", k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("sharded keeps merge to the whole-data profile; duplicates are no-ops") {
    check(Prop.forAll(genRows, Gen.choose(0, 3)) { (rows, pivot) =>
      val whole = profile(rows)
      // arbitrary split: shard by value mod 4 against a moving pivot
      val (s1, s2) = rows.partition(r => r._2 % 4 <= pivot)
      val mergedKeeps = Seq(s1, s2).filter(_.nonEmpty).map { sh =>
        Sketches.kmvKeep(
          Sketches.kmvHashes(sh.toDF("g", "v"), "g", "v"), "g", k)
      }.reduce(_ union _)
      val merged = Sketches.kmvProfile(Sketches.kmvKeep(mergedKeeps, "g", k), "g", k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val doubled = profile(rows ++ rows)
      merged == whole && doubled == whole
    })
  }

  test("under k distinct values the estimate is the exact distinct count") {
    check(Prop.forAll(genRows) { rows =>
      val small = rows.map { case (g, v) => (g, v % (k - 1)) } // < k distincts
      val exact = small.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(_._2).distinct.size.toDouble
      }
      profile(small).forall { case (g, nKept, _, est) =>
        est == exact(g) && nKept.toDouble == exact(g)
      }
    })
  }

  // ------------------------------------- lattice-histogram quantiles

  private val latticeQs = Seq("p25" -> 250000L, "p50" -> 500000L,
    "p90" -> 900000L, "p100" -> 1000000L)

  /** Reference semantics, computed directly: smallest value whose
    * 1-based rank in the sorted multiset reaches ceil(q·n). */
  private def refQuantiles(values: Seq[Long]): Seq[Long] = {
    val sorted = values.sorted
    val n = sorted.size.toLong
    latticeQs.map { case (_, ppm) =>
      val rank = (ppm * n + 999999L) / 1000000L
      sorted((rank - 1).toInt)
    }
  }

  private def latticeProfile(rows: Seq[(String, Long)]): Map[String, (Long, Seq[Long])] =
    Sketches.latticeQuantiles(
      Sketches.latticeHistogram(rows.toDF("g", "v"), "g", $"v"),
      "g", latticeQs)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), (2 to 5).map(r.getLong).toSeq))
      .toMap

  test("lattice quantiles equal direct order statistics for ANY multiset; shards merge") {
    check(Prop.forAll(genRows, Gen.choose(0, 3)) { (rows, pivot) =>
      val whole = latticeProfile(rows)
      val direct = rows.groupBy(_._1).map { case (g, rs) =>
        g -> (rs.size.toLong, refQuantiles(rs.map(_._2)))
      }
      // merging arbitrary shard histograms reproduces the whole profile
      val (s1, s2) = rows.partition(r => r._2 % 4 <= pivot)
      val shardHists = Seq(s1, s2).filter(_.nonEmpty).map(sh =>
        Sketches.latticeHistogram(sh.toDF("g", "v"), "g", $"v"))
      val merged = Sketches.latticeQuantiles(
        Sketches.mergeLatticeHistograms(shardHists, "g"), "g", latticeQs)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), (2 to 5).map(r.getLong).toSeq))
        .toMap
      whole == direct && merged == whole
    })
  }
}
