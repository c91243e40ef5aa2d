package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.control.ControlTable
import graft.ingest.TreeIngest
import graft.model.{Scd2Config, Schemas}
import graft.scd2.Historizer
import graft.stage.StageToInt
import graft.store.TableStore

/** End-to-end batch pipeline: the semantics of the reference's two
  * Airflow DAGs (`Airflow-DAG.py:476-577` parent,
  * `historization_module.py` child) as one driver program.
  *
  * Where the reference hops processes per task and ships state through
  * XCom (SURVEY D1-D8), here every stage is a DataFrame transform in one
  * lazy plan per materialization; "task boundaries" that matter for
  * recovery are exactly the control-table status transitions (ST5).
  */
class Pipeline(spark: SparkSession, store: TableStore,
    interfaceName: String = "ESP_DHT11_DATA", interfaceCd: String = "001",
    conf: Scd2Config = Scd2Config()) {

  val ctl = new ControlTable(spark, store)
  val landingName = "dht11_data"
  val intName = "dht11_data_int"
  val targetName = "hist_dht11_data"

  /** One run: tree → landing → INT → SCD2 → finalize. Mirrors the parent
    * DAG task chain (Airflow-DAG.py:574-577) incl. the empty-delta branch
    * (D2) and the prev-run Success gate. `now` is injected for
    * deterministic tests (reference uses statement-time SYSDATE, F11). */
  def run(treePath: String, deviceId: String, now: Timestamp): RunResult = {
    // CHECK_FOR_INTERFACE_EXISTENCE + GET_ETL_PREV_RUN_DATE_TIME — one
    // metadata lookup serves both the Success gate and the watermark
    val prev = ctl.prevRunDetails(interfaceCd)
    require(prev.forall(_._1 == "Success"),
      s"previous run for $interfaceCd did not finish with status Success")
    val prevStart = prev.map(_._2).getOrElse(Schemas.epoch)
    val loadKey = prev.map(_._3).getOrElse(0L) + 1L  // F14

    // PRINT_VARIABLES_AND_GENERATE_NEW_LOAD_KEY
    ctl.addCurrentRunEntry(interfaceName, interfaceCd, loadKey, now)

    // GET_FIREBASE_DELTA_DHT_DATA: distributed read + flatten + threshold.
    // Cached: the delta feeds the empty-branch check, the landing write
    // and the ingested count (reference parity: len(data_list),
    // STG_Firebase2Oracle.py:73) without re-reading the tree.
    val delta = ingestDelta(treePath, deviceId, prevStart)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ingested = delta.count()

    // check_data_list_task branch (D2 / ST6)
    if (ingested == 0) {
      delta.unpersist()
      ctl.updateStatus(interfaceCd, loadKey, "Success", now)
      return RunResult(loadKey, ingested = 0, inserted = 0, skipped = true)
    }

    // TRUNCATE_EXISTING_LANDING_DATA + LANDING load (S7 + S5): landing is
    // partitioned by deviceid, so the device re-land is a partition-level
    // delete + append — no rewrite of other devices' data
    store.deletePartition(landingName, "deviceid", deviceId)
    store.appendPartitioned(landingName, delta, Seq("deviceid"))
    ctl.updateStatus(interfaceCd, loadKey, "APP SPECIFIC LOADING COMPLETED", now)

    // LANDING_TO_INTERMEDIATE_TABLE (S6) + HIST_LOAD_CONTROL entry.
    // Schema-pinned read: keeps deviceid a string even if a future device
    // id looks numeric to partition-column type inference.
    store.append(intName, StageToInt(
      store.readOrEmpty(landingName, Schemas.landing), loadKey, deviceId))
    ctl.addHistLoadEntry(loadKey, interfaceName, "in progress", now, now, now)
    ctl.updateStatus(interfaceCd, loadKey, "INTEGRATION LOAD COMPLETED", now)

    // trigger_DAG_WF_EXT_SCD2_HISTORIZATION_LOAD (D3 → direct call).
    // Partition-scoped MERGE: only the natural-key buckets this batch
    // touches are rewritten (dynamic partition overwrite); `inserted`
    // counts the cached touched-bucket content — no full-target re-scan.
    val src = store.readOrEmpty(intName, Schemas.intermediate)
    val tgtStored = store.readOrEmpty(targetName, Schemas.scd2TargetStored)
    // localCheckpoint (eager) PINS the new bucket content before the
    // dynamic overwrite deletes the old files its plan lazily reads —
    // a plain persist() recomputes from the mutated target on cache
    // eviction (FileNotFound or a silently wrong count). The count runs
    // before the write for the same reason, and the checkpointed blocks
    // are GC-reclaimed after the run (no cache-registry leak).
    val touched = Historizer.applyScd2Partitioned(
        src, tgtStored, conf.copy(loadKey = loadKey), now)
      .localCheckpoint(true)
    val inserted = touched
      .filter(col("da_inserted_datetime") === lit(now) && col("da_current_flag") === "Y")
      .count()
    store.overwritePartitionsDynamic(targetName, touched, Seq("nk_bucket"))

    // UPDATE_STATUS_AND_FINISH_WORKFLOW
    ctl.markHistLoadProcessed(loadKey, interfaceName)
    ctl.updateStatus(interfaceCd, loadKey, "Success", now)
    delta.unpersist()
    RunResult(loadKey, ingested, inserted, skipped = false)
  }

  /** GET_FIREBASE_DELTA task boundary — overridable test seam for fault
    * injection (the reference injects failures the same way: a task that
    * raises, Airflow-DAG.py:467-474). */
  protected def ingestDelta(treePath: String, deviceId: String,
      prevStart: Timestamp): DataFrame =
    TreeIngest.toLanding(
      TreeIngest.flatten(TreeIngest.readTree(spark, treePath)), deviceId, prevStart)

  /** D7 retry policy: the reference retries every Airflow task once after
    * a 30 s delay (`Airflow-DAG.py:467-474`, `historization_module.py:
    * 26-33`). The engine's unit of recovery is the whole run (its "task
    * boundaries" are the control-table status transitions, ST5), so a
    * failed attempt is ROLLED BACK — control rows, hist-load entry and
    * the INT append for the attempt's load key are removed; the landing
    * re-land is idempotent (partition delete + append) and the SCD2
    * target swap is atomic, replaying the same batch as 'NC' — and the
    * run replays after `retryDelayMs`. On exhaustion the attempt's
    * control entry is marked Failed, which blocks the next run at the
    * Success gate exactly as in the reference (main.py:15-20). `sleep`
    * is injectable for tests. */
  def runWithRetry(treePath: String, deviceId: String, now: Timestamp,
      retries: Int = 1, retryDelayMs: Long = 30000L,
      sleep: Long => Unit = Thread.sleep): RunResult = {
    var attempt = 0
    while (true) {
      // snapshot the latest load key BEFORE the attempt: rollback (and the
      // Failed stamp) may only touch an entry THIS attempt minted — a
      // pre-existing Failed entry from an earlier exhausted run must keep
      // blocking the gate until a human intervenes, and a gate refusal
      // creates nothing to roll back
      val before = ctl.prevRunDetails(interfaceCd).map(_._3)
      try return run(treePath, deviceId, now)
      catch {
        case scala.util.control.NonFatal(e) =>
          val minted = ctl.prevRunDetails(interfaceCd)
            .filter(d => d._1 != "Success" && !before.contains(d._3))
          if (attempt >= retries) {
            minted.foreach { case (_, _, key) =>
              ctl.updateStatus(interfaceCd, key, "Failed", now)
            }
            throw e
          }
          attempt += 1
          minted.foreach { case (_, _, key) => rollbackAttempt(key) }
          sleep(retryDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Remove a failed attempt's side effects so the retry replays from a
    * clean slate. Metadata-scale rewrites (control tables hold a handful
    * of rows); the INT delete uses the load_key the attempt minted. */
  private def rollbackAttempt(loadKey: Long): Unit = {
    import org.apache.spark.sql.Encoders
    store.deleteWhere(ctl.controlName, Encoders.product[graft.model.ControlEntry].schema,
      col("interface_cd") === interfaceCd && col("load_key") === loadKey)
    store.deleteWhere(ctl.histLoadName,
      Encoders.product[graft.model.HistLoadControlEntry].schema,
      col("load_key") === loadKey && col("subject_area") === interfaceName)
    store.deleteWhere(intName, Schemas.intermediate, col("load_key") === loadKey)
  }
}

case class RunResult(loadKey: Long, ingested: Long, inserted: Long, skipped: Boolean)
