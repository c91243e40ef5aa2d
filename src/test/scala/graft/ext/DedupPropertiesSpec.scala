package graft.ext

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec

/** ScalaCheck property for the edit-distance fuzzy join's candidate
  * blocking: the pigeonhole segment scheme must have NO false negatives —
  * for ANY base string and ANY sequence of ≤ d random edits
  * (substitution / insertion / deletion at arbitrary positions), the
  * edited string must come back paired with its base at the true
  * distance bound. This executes the PassJoin recall proof instead of
  * trusting it: an off-by-one in the probe-length window or the segment
  * split silently loses pairs, and only a generator that explores edge
  * lengths and edit positions will find it. */
class DedupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = "abcdexyz"

  private val genBase: Gen[String] = for {
    n <- Gen.choose(2, 18)
    cs <- Gen.listOfN(n, Gen.oneOf(alpha))
  } yield cs.mkString

  /** One random edit at a random position. */
  private def genEdit(s: String): Gen[String] =
    if (s.isEmpty) Gen.oneOf(alpha).map(_.toString)
    else for {
      kind <- Gen.choose(0, 2)
      pos <- Gen.choose(0, math.max(0, s.length - 1))
      c <- Gen.oneOf(alpha)
    } yield kind match {
      case 0 => s.updated(pos, c)                       // substitution
      case 1 => s.take(pos) + c + s.drop(pos)           // insertion
      case 2 => s.take(pos) + s.drop(pos + 1)           // deletion
    }

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("blocking recall: every <= d-edit variant pairs with its base") {
    val d = 2
    val genCase: Gen[(String, String)] = for {
      base <- genBase
      nEdits <- Gen.choose(1, d)
      edited <- (1 to nEdits).foldLeft(Gen.const(base)) { (g, _) =>
        g.flatMap(genEdit)
      }
    } yield (base, edited)
    check(Prop.forAll(Gen.listOfN(4, genCase)) { cases =>
      val rows = cases.zipWithIndex.flatMap { case ((base, edited), i) =>
        Seq((i * 2L, base), (i * 2L + 1L, edited))
      }.toDF("id", "s")
      val pairs = Dedup.editDistancePairs(rows, d, "id", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      cases.zipWithIndex.forall { case ((base, edited), i) =>
        val key = (i * 2L, i * 2L + 1L)
        // identical strings (edits can cancel) pair at distance 0;
        // otherwise the variant must be found at its true distance <= d
        if (base == edited) pairs.get(key).contains(0L)
        else pairs.contains(key) && pairs(key) >= 1L && pairs(key) <= d
      }
    })
  }
}
