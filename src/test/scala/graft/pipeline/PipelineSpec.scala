package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.control.ControlTable
import graft.ingest.TreeIngest
import graft.model.Schemas
import graft.store.TableStore

/** End-to-end pipeline spec — SURVEY §7.4's minimum slice: tree → flatten
  * → threshold filter → landing → INT → SCD2 → control-table Success;
  * re-run absorbs as NC. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  val fixture = getClass.getResource("/firebase_tree.json").getPath
  val dev = "DEV01OMKARVARMA"

  def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-pipe").toString)

  test("tree ingest: flatten + N/A defaults + epoch-default threshold (S1/S2/P1/F13)") {
    val flat = TreeIngest.flatten(TreeIngest.readTree(spark, fixture))
    assert(flat.count() == 6)
    val landing = TreeIngest.toLanding(flat, dev, Schemas.epoch)
    assert(landing.count() == 6) // missing-Timestamp row defaults to epoch ⇒ passes
    val naHum = landing.filter($"humidity" === "N/A")
    assert(naHum.count() == 1) // 09:15 row missing Humidity
    assert(landing.filter($"timestamp".isNull).count() == 1) // 09:10 row
    // threshold at 2024-03-02 00:00:00 keeps the 2 day-2 rows; boundary >= kept
    val th = Timestamp.valueOf("2024-03-02 09:00:00")
    val filtered = TreeIngest.toLanding(flat, dev, th)
    assert(filtered.count() == 2) // 09:00 boundary row (>=) + 10:30
  }

  test("full pipeline run then re-run: SCD2 absorbs, control table advances (ST1-ST6)") {
    val store = freshStore()
    val pipe = new Pipeline(spark, store)
    val ctl = new ControlTable(spark, store)

    val now1 = Timestamp.valueOf("2024-03-02 11:00:00")
    val r1 = pipe.run(fixture, dev, now1)
    assert(!r1.skipped && r1.loadKey == 1L)
    // 6 land; the null-Timestamp row classifies 'I' but never matches the
    // insert join (null natural key, Oracle `=` semantics) ⇒ 5 inserted
    assert(r1.ingested == 6 && r1.inserted == 5)
    assert(ctl.prevRunDetails("001").get._1 == "Success")

    val tgt = store.read(pipe.targetName)
    assert(tgt.count() == 5)
    assert(tgt.filter($"da_current_flag" === "Y").count() == 5)

    // re-run: prev start = now1, fixture max ts = 2024-03-02 10:30 < now1
    // ⇒ only the epoch-defaulted missing-Timestamp row... which lands as
    // null ts but passes the >= filter via epoch? No: epoch < now1 ⇒ excluded.
    val now2 = Timestamp.valueOf("2024-03-03 11:00:00")
    val r2 = pipe.run(fixture, dev, now2)
    assert(r2.skipped && r2.loadKey == 2L)
    assert(store.read(pipe.targetName).count() == 5) // unchanged

    // gate: force last status non-Success ⇒ next run refuses
    ctl.addCurrentRunEntry("ESP_DHT11_DATA", "001", 3L, now2, "APP SPECIFIC LOADING")
    intercept[IllegalArgumentException] {
      pipe.run(fixture, dev, Timestamp.valueOf("2024-03-04 11:00:00"))
    }
  }

  test("D7 retry: transient failure rolls back and replays to Success; exhaustion marks Failed") {
    val store = freshStore()
    var failuresLeft = 1
    val pipe = new Pipeline(spark, store) {
      override protected def ingestDelta(treePath: String, deviceId: String,
          prevStart: Timestamp) = {
        if (failuresLeft > 0) { failuresLeft -= 1; sys.error("transient ingest failure") }
        super.ingestDelta(treePath, deviceId, prevStart)
      }
    }
    val ctl = new ControlTable(spark, store)
    var slept = 0L
    val now1 = Timestamp.valueOf("2024-03-02 11:00:00")
    // attempt 1 fails after the control entry is created; retry replays
    val r = pipe.runWithRetry(fixture, dev, now1, retries = 1,
      retryDelayMs = 30000L, sleep = slept += _)
    assert(!r.skipped && r.inserted == 5 && slept == 30000L)
    assert(ctl.prevRunDetails("001").get._1 == "Success")
    // rollback left exactly one control entry (the successful attempt)
    assert(ctl.control.filter($"interface_cd" === "001").count() == 1)
    assert(store.read(pipe.targetName).count() == 5)

    // exhaustion: both attempts fail ⇒ Failed status blocks the next run
    failuresLeft = 2
    val ex = intercept[RuntimeException] {
      pipe.runWithRetry(fixture, dev, Timestamp.valueOf("2024-03-03 11:00:00"),
        retries = 1, retryDelayMs = 1L, sleep = _ => ())
    }
    assert(ex.getMessage.contains("transient"))
    assert(ctl.prevRunDetails("001").get._1 == "Failed")
    intercept[IllegalArgumentException] {
      pipe.run(fixture, dev, Timestamp.valueOf("2024-03-04 11:00:00"))
    }

    // a LATER runWithRetry against the exhausted state must NOT erase the
    // Failed entry to sneak past the gate — it refuses identically
    failuresLeft = 0
    val failedKey = ctl.prevRunDetails("001").get._3
    intercept[IllegalArgumentException] {
      pipe.runWithRetry(fixture, dev,
        Timestamp.valueOf("2024-03-05 11:00:00"), retries = 1,
        retryDelayMs = 1L, sleep = _ => ())
    }
    assert(ctl.prevRunDetails("001").get._1 == "Failed")
    assert(ctl.prevRunDetails("001").get._3 == failedKey)
  }

  test("re-run with epoch threshold: every row absorbs as NC, target stable") {
    val store = freshStore()
    val pipe = new Pipeline(spark, store)
    val now1 = Timestamp.valueOf("1970-01-01 00:00:00") // epoch start ⇒ re-runs see all
    val r1 = pipe.run(fixture, dev, now1)
    assert(r1.inserted == 5) // null-nk row dropped at insert join
    val r2 = pipe.run(fixture, dev, Timestamp.valueOf("1970-01-01 00:00:01"))
    // threshold = prev start = epoch ⇒ all 6 re-ingest; 5 absorb as NC,
    // the null-nk row re-classifies 'I' and is re-dropped — stable
    assert(!r2.skipped)
    assert(r2.inserted == 0)
    val tgt = store.read(pipe.targetName)
    assert(tgt.count() == 5)
    assert(tgt.filter($"da_current_flag" === "Y").count() == 5)
  }
}
