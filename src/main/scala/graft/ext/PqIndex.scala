package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.store.TableStore

/** Persisted PQ index: build once, search many — the operational shape of
  * [[KMeans.pqTopK]] (which re-trains per call; fine for a query, wrong
  * for a serving index). `build` persists two tables into a [[TableStore]]:
  *
  *  - `<name>_codebook` — (sub, cent_id, cq): m·k rows, the trained state;
  *  - `<name>_codes` — (id, sub, cent_id, d2): m small ints per corpus
  *    vector, range-clustered by id so a production reader gets disjoint
  *    file ranges (and an id-filtered lookup prunes files by footer
  *    stats).
  *
  * Because the trainer is deterministic (integer lattice, hash seeds),
  * the persisted index equals what a fresh [[KMeans.pqTopK]] would
  * compute on the same corpus — searches against the store are
  * hash-identical to the recompute path (oracle-asserted by
  * `q_sim_pq_indexed` sharing `q_sim_pq_search`'s oracle). At 100 TB the
  * build is the one corpus-scale job; every search after touches only
  * the codes table (m ints/vector — ~1% of the float column) plus a
  * broadcast codebook. */
object PqIndex {

  def build(store: TableStore, emb: DataFrame, name: String = "pq",
      subspaces: Int = 8, subDim: Int = 8, k: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val cents = KMeans.pqFit(emb, subspaces, subDim, k, iters, idCol, embCol)
    store.overwrite(s"${name}_codebook", cents)
    store.overwriteClustered(s"${name}_codes",
      KMeans.pqAssignments(emb, cents, subspaces, subDim, idCol, embCol),
      Seq("id"))
  }

  def search(store: TableStore, queries: DataFrame, topK: Int,
      name: String = "pq", subspaces: Int = 8, subDim: Int = 8,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    KMeans.pqSearchFrom(store.read(s"${name}_codes"),
      store.read(s"${name}_codebook"), queries, topK, subspaces, subDim,
      idCol, embCol)

  /** Online index maintenance: encode NEW vectors against the FROZEN
    * codebook and append their codes — no re-training, one broadcast
    * pass over the increment (the same frozen-state discipline as
    * [[KMeans.driftReport]], which is also the tool that says when this
    * stops being good enough and a re-[[build]] is due). Re-ingested ids
    * are dropped (first write wins, the [[IncrementalDedup]] contract),
    * so re-running an increment is idempotent. Appends add files rather
    * than extending the clustered layout — `TableStore.compact` restores
    * it when the tail grows. */
  def appendIncrement(store: TableStore, emb: DataFrame, name: String = "pq",
      subspaces: Int = 8, subDim: Int = 8,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val codesName = s"${name}_codes"
    val cents = store.read(s"${name}_codebook")
    val fresh = KMeans.pqAssignments(emb, cents, subspaces, subDim,
        idCol, embCol)
      .join(store.read(codesName).select(col("id")).distinct(),
        Seq("id"), "left_anti")
    store.append(codesName, fresh)
  }
}
