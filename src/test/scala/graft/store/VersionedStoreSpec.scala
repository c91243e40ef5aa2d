package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mkStore() =
    new VersionedStore(spark,
      Files.createTempDirectory("graft-vstore").toString)

  test("snapshots are immutable: time travel reproduces every version") {
    val vs = mkStore()
    val v0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val v1 = Seq((1L, "a"), (3L, "C"), (4L, "d")).toDF("id", "v")
    assert(vs.write("t", v0) === 0)
    assert(vs.write("t", v1) === 1)
    assert(vs.latestVersion("t") === Some(1))
    val r0 = vs.read("t", 0).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rL = vs.read("t").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(r0 === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rL === Set((1L, "a"), (3L, "C"), (4L, "d")))
    vs.destroy()
  }

  test("diff is a bag diff: inserts, deletes, and duplicate multiplicity") {
    val vs = mkStore()
    // v0 holds the row (9,'x') TWICE; v1 holds it once — the diff must
    // report exactly one deletion of it (set semantics would report none)
    val v0 = Seq((1L, "a"), (9L, "x"), (9L, "x")).toDF("id", "v")
    val v1 = Seq((1L, "a"), (9L, "x"), (5L, "n")).toDF("id", "v")
    vs.write("t", v0); vs.write("t", v1)
    val d = vs.diff("t", 0, 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(d.count(_ == (("I", 5L, "n"))) === 1)
    assert(d.count(_ == (("D", 9L, "x"))) === 1)
    assert(d.length === 2) // unchanged rows never appear
    vs.destroy()
  }

  test("vacuum keeps the newest k snapshots; a killed write leaves no snapshot") {
    val vs = mkStore()
    (0 until 4).foreach(i => vs.write("t", Seq((i.toLong, "r")).toDF("id", "v")))
    vs.vacuum("t", keep = 2)
    assert(vs.versions("t") === Seq(2, 3))
    // time travel to a vacuumed version must refuse, not misread
    intercept[IllegalArgumentException](vs.read("t", 0))
    // a leftover temp dir (killed writer) is invisible to the version list
    val base = vs.read("t", 3).inputFiles.head
      .replaceAll("/v3/.*$", "")
    Files.createDirectories(Paths.get(base.replace("file:", ""), ".tmp-v9"))
    assert(vs.versions("t") === Seq(2, 3))
    vs.destroy()
  }
}
