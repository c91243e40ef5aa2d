package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join, spread over salts") {
    // heavily skewed left side: 90% of rows share key 1
    val skewed = ((1 to 900).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, s"w$i"))).toDF("k", "payload")
    val dim = (1L to 10L).map(k => (k, s"name$k")).toDF("k", "name")

    val plain = skewed.join(dim, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, Seq("k"), factor = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted === plain) // exact multiset equality

    // the hot key's rows actually fan out over multiple salt values
    val saltSpread = skewed
      .withColumn("__salt", pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(8)))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(saltSpread > 1, "salting did not spread the hot key")
  }
}
