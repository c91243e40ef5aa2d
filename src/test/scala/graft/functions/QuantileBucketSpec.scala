package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.SparkSpec

class QuantileBucketSpec extends SparkSpec {
  import spark.implicits._

  private def qb(c: org.apache.spark.sql.Column, cuts: Array[Double]) =
    ColumnBridge.column(QuantileBucket(ColumnBridge.expression(c), cuts.toIndexedSeq))

  test("binary search equals the declarative count-of-cuts-≤-x fold") {
    val cuts = Array(1.0, 2.5, 2.5, 7.0) // duplicate cut = skipped bucket, still monotone
    val xs = Seq(0.0, 1.0, 2.4999, 2.5, 3.0, 7.0, 100.0, -5.0).toDF("x")
    val got = xs.select(qb($"x".cast("double"), cuts).as("b"))
      .as[Long].collect().toSeq
    val want = Seq(0.0 -> 0L, 1.0 -> 1L, 2.4999 -> 1L, 2.5 -> 3L,
      3.0 -> 3L, 7.0 -> 4L, 100.0 -> 4L, -5.0 -> 0L).map(_._2)
    assert(got == want)
  }

  test("null and NaN bucket to 0 under both eval paths") {
    val cuts = Array(0.0, 1.0)
    val df = Seq[Option[Double]](None, Some(Double.NaN), Some(0.5)).toDF("x")
    // codegen path (projection) and interpreted path (filter eval on the
    // driver via a literal) must agree
    val got = df.select(qb($"x", cuts).as("b")).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L)) // 0.5: one cut (0.0) ≤ x
    val lit0 = qb(lit(null).cast("double"), cuts)
    assert(spark.range(1).select(lit0.as("b")).as[Long].head() == 0L)
  }

  test("semantically identical instances are equal (canonicalization/CSE work)") {
    val e = ColumnBridge.expression(lit(1.0).cast("double"))
    val a = QuantileBucket(e, IndexedSeq(1.0, 2.0, 3.0))
    val b = QuantileBucket(e, Vector(1.0, 2.0, 3.0))
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.canonicalized == b.canonicalized)
  }

  test("monotone: buckets never decrease as x increases") {
    val cuts = (1 to 255).map(_.toDouble / 8).toArray
    val xs = (0 until 1000).map(i => i * 0.04).toDF("x")
    val bs = xs.select(qb($"x".cast("double"), cuts).as("b")).as[Long].collect()
    assert(bs.sameElements(bs.sorted))
    assert(bs.last == 255L)
  }
}
