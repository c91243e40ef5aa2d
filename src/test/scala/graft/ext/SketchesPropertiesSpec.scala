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
}
