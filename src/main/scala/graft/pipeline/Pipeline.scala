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
    val delta = TreeIngest.toLanding(
      TreeIngest.flatten(TreeIngest.readTree(spark, treePath)), deviceId, prevStart)
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

    // trigger_DAG_WF_EXT_SCD2_HISTORIZATION_LOAD (D3 → direct call)
    val src = store.readOrEmpty(intName, Schemas.intermediate)
    val tgt = store.readOrEmpty(targetName, Schemas.scd2Target)
    val newTgt = Historizer.applyScd2(src, tgt, conf.copy(loadKey = loadKey), now)
    store.overwrite(targetName, newTgt)
    val inserted = store.read(targetName)
      .filter(col("da_inserted_datetime") === lit(now) && col("da_current_flag") === "Y")
      .count()

    // UPDATE_STATUS_AND_FINISH_WORKFLOW
    ctl.markHistLoadProcessed(loadKey, interfaceName)
    ctl.updateStatus(interfaceCd, loadKey, "Success", now)
    delta.unpersist()
    RunResult(loadKey, ingested, inserted, skipped = false)
  }
}

case class RunResult(loadKey: Long, ingested: Long, inserted: Long, skipped: Boolean)
