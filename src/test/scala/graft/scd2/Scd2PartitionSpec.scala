package graft.scd2

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{Scd2Config, Schemas}
import graft.store.TableStore

/** Partition-scoped SCD2 rewrite (VERDICT r1 #6): a batch touching one
  * natural key must rewrite ONLY that key's hash-bucket partition —
  * every other partition's parquet files stay byte-identical on disk. */
class Scd2PartitionSpec extends SparkSpec {
  import spark.implicits._

  private val conf = Scd2Config(loadKey = 1L)
  private val now1 = Timestamp.valueOf("2024-03-03 00:00:00")
  private val now2 = Timestamp.valueOf("2024-03-04 00:00:00")

  private def batch(loadKey: Long, hum: Int => String): DataFrame =
    (0 until 40).map { i =>
      ("IST", hum(i), "29.4",
        Timestamp.valueOf(f"2024-03-01 09:${i % 60}%02d:00"), s"DEV$i", loadKey)
    }.toDF("timezone", "humidity", "temperature", "timestamp", "deviceid", "load_key")

  /** All parquet data files under the target, relative path → bytes. */
  private def dataFiles(root: Path): Map[String, Array[Byte]] =
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString -> Files.readAllBytes(p))
      .toMap

  test("second batch rewrites only the touched bucket; untouched partition files are byte-identical") {
    val dir = Files.createTempDirectory("graft-scd2-part")
    val store = new TableStore(spark, dir.toString)
    val name = "hist"
    val root = java.nio.file.Paths.get(store.path(name))

    def apply(src: DataFrame, now: Timestamp, loadKey: Long): Unit = {
      val tgtStored = store.readOrEmpty(name, Schemas.scd2TargetStored)
      val touched = Historizer.applyScd2Partitioned(
        src, tgtStored, conf.copy(loadKey = loadKey), now)
      store.overwritePartitionsDynamic(name, touched, Seq("nk_bucket"))
    }

    apply(batch(1L, _ => "60.0"), now1, 1L)
    // eager snapshot: the second apply rewrites files underneath a lazy
    // reader, so pin batch-1's target content now
    val tgt1 = store.read(name).localCheckpoint(true)
    assert(tgt1.count() === 40)
    val nBuckets1 = tgt1.select("nk_bucket").distinct().count()
    assert(nBuckets1 > 1, "fixture must spread over multiple buckets")
    val before = dataFiles(root)
    assert(before.nonEmpty)

    // batch 2: ONE changed reading (DEV7) → exactly one 'U' natural key
    apply(batch(2L, i => if (i == 7) "99.9" else "60.0"), now2, 2L)

    val changedBucket = batch(2L, _ => "")
      .filter($"deviceid" === "DEV7")
      .select(Historizer.nkBucket(conf.naturalKeys, conf.targetBuckets))
      .first().getInt(0)
    val after = dataFiles(root)

    val untouchedBefore = before.filter(!_._1.startsWith(s"nk_bucket=$changedBucket/"))
    assert(untouchedBefore.nonEmpty)
    untouchedBefore.foreach { case (rel, bytes) =>
      assert(after.contains(rel), s"untouched file $rel disappeared")
      assert(java.util.Arrays.equals(after(rel), bytes),
        s"untouched file $rel was rewritten")
    }
    // the touched bucket WAS rewritten (old file set replaced)
    val touchedBefore = before.keySet.filter(_.startsWith(s"nk_bucket=$changedBucket/"))
    val touchedAfter = after.keySet.filter(_.startsWith(s"nk_bucket=$changedBucket/"))
    assert(touchedBefore.nonEmpty && touchedAfter.nonEmpty && touchedBefore != touchedAfter)

    // MERGE semantics intact: 41 rows total, 40 current, DEV7 has 2 versions
    val tgt2 = store.read(name)
    assert(tgt2.count() === 41)
    assert(tgt2.filter($"da_current_flag" === "Y").count() === 40)
    val dev7 = tgt2.filter($"deviceid" === "DEV7")
    assert(dev7.count() === 2)
    assert(dev7.filter($"da_current_flag" === "Y")
      .select("humidity").first().getString(0) === "99.9")
    // pruned-join equivalence: the partitioned apply (join side pruned to
    // the batch's buckets) must produce exactly the full apply's rows for
    // the touched buckets
    val full = Historizer.applyScd2(
        batch(2L, i => if (i == 7) "99.9" else "60.0"),
        tgt1.drop("nk_bucket"), conf.copy(loadKey = 2L), now2)
      .withColumn("nk_bucket", Historizer.nkBucket(conf.naturalKeys, conf.targetBuckets))
      .filter($"nk_bucket" === changedBucket)
    val partitioned = tgt2.filter($"nk_bucket" === changedBucket)
    assert(full.collect().map(_.toString).sorted
      .sameElements(partitioned.collect().map(_.toString).sorted))

    // NC-only batch: nothing touched, every file byte-identical
    apply(batch(3L, i => if (i == 7) "99.9" else "60.0"),
      Timestamp.valueOf("2024-03-05 00:00:00"), 3L)
    val after3 = dataFiles(root)
    assert(after3.keySet === after.keySet)
    after.foreach { case (rel, bytes) =>
      assert(java.util.Arrays.equals(after3(rel), bytes), s"NC batch rewrote $rel")
    }
  }
}
