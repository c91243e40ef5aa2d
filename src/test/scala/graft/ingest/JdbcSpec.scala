package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JDBC source/sink against embedded Derby: roundtrip fidelity, the
  * range-partitioned parallel read, and filter pushdown into the
  * generated SQL (the reference's Oracle path, dbconnect.py). */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val dbDir = Files.createTempDirectory("graft-derby").resolve("db")
  private val url = s"jdbc:derby:$dbDir;create=true"
  System.setProperty("derby.stream.error.file",
    s"${System.getProperty("java.io.tmpdir")}/graft_derby_test.log")

  test("write-then-read roundtrip preserves rows; partitioned read opens N stripes") {
    val df = (0L until 100L).map(i => (i, s"name_$i", i % 7)).toDF("k", "name", "grp")
    JdbcTables.write(df, url, "t_round", SaveMode.Overwrite)

    val single = JdbcTables.read(spark, url, "t_round")
    assert(single.rdd.getNumPartitions === 1) // the reference's one-cursor shape
    assert(single.count() === 100)

    val part = JdbcTables.readPartitioned(spark, url, "t_round", "k", 0L, 99L, 4)
    assert(part.rdd.getNumPartitions === 4)
    // same multiset of rows through the striped read
    assert(part.select(sum($"k")).first().getLong(0) === (0L until 100L).sum)
    assert(part.except(single).isEmpty && single.except(part).isEmpty)
  }

  test("filter pushes into the JDBC scan (database prunes, not Spark)") {
    val q = JdbcTables.readPartitioned(spark, url, "t_round", "k", 0L, 99L, 4)
      .filter($"grp" === 3)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("grp"), physical)
    assert(q.count() === (0L until 100L).count(_ % 7 == 3))
  }
}
