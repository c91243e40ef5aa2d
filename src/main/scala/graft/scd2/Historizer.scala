package graft.scd2

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{Scd2Config, Schemas}

/** SCD Type-2 delta detection + apply, re-expressing the reference's
  * generated-Oracle-SQL engine (`Delta_detection_query_gen.py`) as lazy
  * Catalyst plans.
  *
  * The reference composes one big SQL string (delta-detection query,
  * :87-102), materializes it as a temp table (:140-155), MERGEs the
  * close-out (:187-213) and INSERTs new versions (:215-330). Here each
  * step is a DataFrame transform; the "temp table" is a cached DataFrame
  * and the MERGE+INSERT become a partition-friendly rewrite
  * (close-out ∪ inserts ∪ untouched), since Parquet has no in-place
  * update (SURVEY §7.2).
  *
  * Faithful quirks preserved (SURVEY §7.2):
  *  - delta hash = sha256 over a SEPARATOR-LESS concat of
  *    COALESCE(CAST(col AS STRING),'') (Delta_detection_query_gen.py:42-44)
  *    — plain `concat`, not `concat_ws`, so ("ab","c") and ("a","bc")
  *    collide identically to the reference.
  *  - hash column list = source columns minus
  *    (naturalKeys ∪ excludeFromDelta ∪ excludeFromLoad), in source
  *    schema order (:161-174); the target side recomputes the hash over
  *    the SAME column names (:66).
  *  - rows present only in the target classify 'NC' (stg.hash is null ⇒
  *    `!=` is null ⇒ CASE falls through, :55-56).
  *  - 'PD' (physical delete) is handled by the close-out (:199,202) but
  *    never produced by the classifier (:53-57) — dead path kept.
  *  - the `SUBSTR(ak,1,4) <> 999999` sentinel branch (:250-285) compares
  *    4 chars to a 6-char number — always true, so only the simple
  *    `max + row_number` path is live; we implement that path.
  *  - insert keeps the durable AK for 'U' rows
  *    (`coalesce(ext.ak, max_ak + row_number)`, :253-270) — AK is the
  *    entity key, KEY is the version key (always newly minted).
  *  - insert carries ALL source columns except load-excluded ones —
  *    the reference's NOT IN tuple concatenates cols_to_exclude_from_load
  *    with itself (:236), so delta-excluded columns ARE inserted.
  */
object Historizer {

  /** Surrogate AK/KEY column discovery by naming convention
    * (Delta_detection_query_gen.py:21-35): columns ending _AK or _KEY,
    * sorted; first is the AK, second the KEY. */
  def discoverAkKeyCols(targetCols: Seq[String]): (String, String) = {
    val found = targetCols
      .filter(c => c.toLowerCase.endsWith("_ak") || c.toLowerCase.endsWith("_key"))
      .sorted
    require(found.size >= 2,
      "Error in getting Key and AK column. Please recheck target table definition and try again.")
    (found(0), found(1))
  }

  /** Separator-less null-safe concat hash
    * (Delta_detection_query_gen.py:42-44 + SHA256_HASH at :66,77). */
  def deltaHash(cols: Seq[String]): Column =
    sha2(concat(cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*), 256)

  /** Columns feeding the delta hash (Delta_detection_query_gen.py:161-174):
    * source schema order, minus naturalKeys/exclDelta/exclLoad. */
  def deltaColumns(sourceCols: Seq[String], conf: Scd2Config): Seq[String] = {
    val excluded = (conf.naturalKeys ++ conf.colsToExcludeFromDelta ++
      conf.colsToExcludeFromLoad).map(_.toLowerCase).toSet
    sourceCols.filterNot(c => excluded.contains(c.toLowerCase))
  }

  /** The delta-detection query (reference :87-102): hashed staging slice
    * FULL OUTER JOIN hashed current target slice on natural keys,
    * classified I/U/NC, cross-joined with the surrogate high-water marks.
    *
    * Scale notes: the 1-row max aggregate broadcasts
    * (BroadcastNestedLoopJoin); the full-outer join shuffles both sides
    * by the natural keys — at 100 TB the target side is pre-filtered to
    * `da_current_flag='Y'` before the shuffle, and AQE handles skew.
    */
  /** `marksFrom`: where the surrogate high-water marks aggregate from.
    * Defaults to `tgt`; the partitioned apply passes the FULL target here
    * while pruning `tgt` itself to the buckets the batch can touch —
    * marks must be global even when the join side is pruned. */
  def deltaDetect(src: DataFrame, tgt: DataFrame, conf: Scd2Config,
      marksFrom: Option[DataFrame] = None): DataFrame = {
    val (akCol, keyCol) = discoverAkKeyCols(tgt.columns.toSeq)
    val dCols = deltaColumns(src.columns.toSeq, conf)
    val nk = conf.naturalKeys

    // staging clause (:72-81): natural keys + recomputed hash, batch slice
    val stg = src.filter(col("load_key") === lit(conf.loadKey))
      .select(nk.map(col) :+ deltaHash(dCols).as("delta_hash"): _*)
    // target clause (:61-70): current slice, hash recomputed from payload
    val tgtH = tgt.filter(col("da_current_flag") === "Y")
      .select(Seq(col(keyCol), col(akCol)) ++ nk.map(col)
        :+ deltaHash(dCols).as("delta_hash"): _*)

    val joinCond = nk.map(k => stg(k) === tgtH(k)).reduce(_ && _)
    val insertCond = nk.map(k => tgtH(k).isNull).reduce(_ || _)
    val updateCond = nk.map(k => tgtH(k) === stg(k)).reduce(_ && _) &&
      stg("delta_hash") =!= tgtH("delta_hash")

    val classified = stg.join(tgtH, joinCond, "full_outer")
      .select(
        Seq(tgtH(akCol).as(akCol), tgtH(keyCol).as(keyCol)) ++
        nk.map(k => coalesce(stg(k), tgtH(k)).as(k)) :+
        when(insertCond, "I").when(updateCond, "U").otherwise("NC").as("upsert_cd"): _*)

    // cross-join high-water marks (:37-40, :89-90): 1-row side → broadcast
    val maxVals = marksFrom.getOrElse(tgt).agg(
      coalesce(max(col(keyCol)), lit(0L)).cast("long").as("max_key"),
      coalesce(max(col(akCol)), lit(0L)).cast("long").as("max_ak"))
    classified.crossJoin(broadcast(maxVals))
  }

  /** Close-out (reference MERGE :187-213): target rows whose surrogate KEY
    * matches a 'U'/'PD' delta row get flags flipped and validity closed.
    * Surrogate-key join ⇒ exactly the matched current versions.
    */
  def closeOut(tgt: DataFrame, delta: DataFrame, now: Timestamp): DataFrame = {
    val (akCol, keyCol) = discoverAkKeyCols(tgt.columns.toSeq)
    // Per-batch delta is small next to a 100 TB target; AQE picks a
    // broadcast join at runtime — no forced hint, so a huge backfill
    // batch still degrades gracefully to shuffle join.
    val hits = delta.filter(col("upsert_cd").isin("U", "PD"))
      .select(col(keyCol).as("__k"), col("upsert_cd"))
    val joined = tgt.join(hits, tgt(keyCol) === hits("__k"), "left")
    val matched = hits("__k").isNotNull
    joined.select(
      tgt.columns.map {
        case c if c == "da_current_flag" =>
          when(matched, "N").otherwise(tgt(c)).as(c)
        case c if c == "da_valid_to_date" =>
          when(matched, lit(now)).otherwise(tgt(c)).as(c)
        case c if c == "da_updated_datetime" =>
          when(matched, lit(now)).otherwise(tgt(c)).as(c)
        case c if c == "da_deleted_flag" =>
          when(matched && col("upsert_cd") === "PD", "Y")
            .when(matched, "N").otherwise(tgt(c)).as(c)
        case c => tgt(c).as(c)
      }.toSeq: _*)
  }

  /** New-version insert rows (reference :215-330): source batch joined to
    * 'I'/'U' delta rows on natural keys, with minted surrogate keys and
    * da_* system columns.
    *
    * Surrogate minting: the reference's `ROW_NUMBER() OVER (ORDER BY 'JP')`
    * (:266-270) funnels to one task; its constant sort key makes the
    * assignment ARBITRARY-but-gapless, so any total order is equally
    * faithful. Default path orders by the natural keys (deterministic for
    * tests and oracle checks); `conf.scalableSurrogates` switches to the
    * distributed gapless index (SURVEY §7.5 #3) for huge backfill batches.
    */
  def insertRows(src: DataFrame, delta: DataFrame, tgtCols: Seq[String],
      conf: Scd2Config, now: Timestamp): DataFrame = {
    val (akCol, keyCol) = discoverAkKeyCols(tgtCols)
    val nk = conf.naturalKeys
    // :232-243 — NOT IN (exclLoad + exclLoad): only load-excluded dropped
    val srcCols = src.columns.toSeq
      .filterNot(c => conf.colsToExcludeFromLoad.map(_.toLowerCase).contains(c.toLowerCase))
      .sorted
    val ext = delta.filter(col("upsert_cd").isin("I", "U"))
      .select(nk.map(c => col(c).as(s"__nk_$c")) ++
        Seq(col(akCol).as("__ext_ak"), col("max_ak"), col("max_key")): _*)
    val batch = src.filter(col("load_key") === lit(conf.loadKey))
    val joined = batch.join(ext,
      nk.map(k => batch(k) === ext(s"__nk_$k")).reduce(_ && _), "inner")

    val dCols = deltaColumns(src.columns.toSeq, conf)
    // delta_hash is stored only when the target schema carries it (the
    // DHT target does, FIXTURES.md A4); always recomputed on read anyway.
    val hashCols =
      if (tgtCols.map(_.toLowerCase).contains("delta_hash"))
        Seq(deltaHash(dCols).as("delta_hash"))
      else Seq.empty
    // Surrogate index: BOTH paths are distributed (no single-task window
    // — the faithful `ROW_NUMBER() OVER (ORDER BY ...)` form funnels the
    // whole batch through one task at scale). Default: distributed sort
    // by the natural keys + gapless zipWithIndex — value-identical to
    // row_number ordered by nk (deterministic for tests and oracles).
    // `scalableSurrogates` additionally skips the sort: arbitrary-but-
    // gapless, for backfills where even the batch sort is unwanted.
    val indexed =
      if (conf.scalableSurrogates) withGaplessIndex(joined, "__rn")
      else withGaplessIndex(joined.orderBy(nk.map(col): _*), "__rn")
    indexed
      .select(
        Seq(
          // AK: keep durable key for U rows, mint for I (:250-270)
          coalesce(col("__ext_ak"), col("max_ak") + col("__rn")).as(akCol),
          // KEY: always a fresh version key (:271-283)
          (col("max_key") + col("__rn")).as(keyCol)) ++
        srcCols.map(col) ++ hashCols ++
        Seq(
          lit(now).as("da_updated_datetime"),
          lit(now).as("da_inserted_datetime"),
          lit(Schemas.openEndedValidTo).as("da_valid_to_date"),
          lit(now).as("da_valid_from_date"),
          lit("N").as("da_deleted_flag"),
          lit("Y").as("da_current_flag")): _*)
  }

  /** Gapless 1..N row index without a single-task window: RDD
    * `zipWithIndex` computes per-partition counts, then offsets each
    * partition — two narrow passes, fully parallel. This is the one
    * sanctioned RDD drop-down in the engine (genuine per-partition
    * imperative logic; `monotonically_increasing_id` is NOT gapless and
    * the reference's minted keys must be). */
  def withGaplessIndex(df: DataFrame, name: String): DataFrame = {
    val schema = df.schema.add(name,
      org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Full SCD2 apply: detect → close-out ∪ inserts, with the reference's
    * column-set contract check before writing
    * (Delta_detection_query_gen.py:308-330, SURVEY D8). Returns the new
    * target content (caller persists it, e.g. TableStore.overwrite). */
  def applyScd2(src: DataFrame, tgt: DataFrame, conf: Scd2Config,
      now: Timestamp): DataFrame = {
    // localCheckpoint, not persist: the delta feeds two plan branches
    // (close-out, inserts) so it must materialize once — but a persist()
    // entry lives in the cache registry until someone unpersists, and
    // callers that loop (streaming foreachBatch) would leak one cached
    // DataFrame per batch. Checkpointed blocks are GC-reclaimed when the
    // batch's plans are dropped.
    val delta = deltaDetect(src, tgt, conf).localCheckpoint(true)
    val closed = closeOut(tgt, delta, now)
    val ins = insertRows(src, delta, tgt.columns.toSeq, conf, now)
    require(ins.columns.sorted.sameElements(tgt.columns.sorted),
      s"Columns returned by select query and columns in target table are not same: " +
        s"${ins.columns.sorted.mkString(",")} vs ${tgt.columns.sorted.mkString(",")}")
    closed.unionByName(ins.select(tgt.columns.map(col).toSeq: _*))
  }

  /** Point-in-time read of a historized target — the query shape the
    * SCD2 table EXISTS for (the reference historizes
    * `HIST_DHT11_DATA` precisely so consumers can ask "what did this
    * row look like at instant T", Delta_detection_query_gen.py:287-296).
    * Each probe row resolves to the version whose validity interval
    * covers its as-of instant; because [[closeOut]] stamps the closed
    * version's `da_valid_to_date` with the same `now` the replacement's
    * `da_valid_from_date` gets, the intervals
    * [da_valid_from_date, da_valid_to_date) PARTITION time per natural
    * key — at most one version matches any probe. Probes before a key's
    * first version, or for keys the registry never saw, keep null
    * target columns (left join).
    *
    * Scale: ONE equi-join shuffle on the natural keys with the validity
    * test as a post-join filter — never a range-join product; with a
    * metadata-sized probe set AQE broadcasts it and the target is not
    * shuffled at all. */
  def pointInTime(tgt: DataFrame, probes: DataFrame, conf: Scd2Config,
      asOfCol: String): DataFrame = {
    val cond = conf.naturalKeys.map(k => probes(k) === tgt(k)).reduce(_ && _) &&
      probes(asOfCol) >= tgt("da_valid_from_date") &&
      probes(asOfCol) < tgt("da_valid_to_date")
    probes.join(tgt, cond, "left")
  }

  /** Natural-key hash bucket — the SCD2 target's partition key. Engine-
    * internal (never oracle-compared), so the fast builtin xxhash64 is
    * fine; deterministic across runs and executors. */
  def nkBucket(naturalKeys: Seq[String], buckets: Int): Column =
    pmod(xxhash64(naturalKeys.map(col): _*), lit(buckets.toLong)).cast("int")

  /** Partition-scoped SCD2 apply: the MERGE semantics of [[applyScd2]],
    * but returning ONLY the new content of the natural-key-hash buckets
    * this batch's delta touches (with the `nk_bucket` partition column
    * attached). Written via dynamic partition overwrite, untouched
    * buckets' files are never rewritten — per-batch write cost is
    * O(touched buckets), not O(target) (VERDICT r1 #6).
    *
    * `tgtStored` is the stored layout (Schemas.scd2TargetStored): payload
    * columns + nk_bucket. High-water marks and delta classification still
    * see the FULL target (the close-out scan prunes to touched buckets —
    * a 'U' row's current version lives in the same bucket as its natural
    * key by construction). */
  def applyScd2Partitioned(src: DataFrame, tgtStored: DataFrame,
      conf: Scd2Config, now: Timestamp): DataFrame = {
    val tgt = tgtStored.drop("nk_bucket")
    val bucketOf = nkBucket(conf.naturalKeys, conf.targetBuckets)
    // Prune the delta-detect JOIN side to the buckets the batch's natural
    // keys hash into (equal keys hash to equal buckets, so no match is
    // lost; target-only rows classify NC, which nothing downstream
    // consumes). This turns the per-batch full-outer shuffle from
    // O(current target slice) into O(batch-touched bucket slice) — at
    // 100 TB the difference between scanning the table and scanning a
    // few buckets. Marks still aggregate over the FULL target.
    val srcBuckets = src.filter(col("load_key") === lit(conf.loadKey))
      .select(bucketOf.as("__b")).distinct().collect().map(_.getInt(0)).toSeq
    val tgtPruned = tgtStored.filter(col("nk_bucket").isin(srcBuckets: _*))
      .drop("nk_bucket")
    // localCheckpoint for the same reason as applyScd2 — per-micro-batch
    // calls from StreamingIngest.scd2Sink must not grow the cache registry
    val delta = deltaDetect(src, tgtPruned, conf, marksFrom = Some(tgt))
      .localCheckpoint(true)
    // ≤ targetBuckets distinct values — metadata-scale collect, and the
    // literal IN list lets the touched-bucket filter prune partitions at
    // the parquet scan
    val touched = delta.filter(col("upsert_cd").isin("I", "U"))
      .select(bucketOf.as("__b")).distinct().collect().map(_.getInt(0)).toSeq
    val tgtTouched = tgtStored
      .filter(col("nk_bucket").isin(touched: _*)).drop("nk_bucket")
    val closed = closeOut(tgtTouched, delta, now)
    val ins = insertRows(src, delta, tgt.columns.toSeq, conf, now)
    require(ins.columns.sorted.sameElements(tgt.columns.sorted),
      s"Columns returned by select query and columns in target table are not same: " +
        s"${ins.columns.sorted.mkString(",")} vs ${tgt.columns.sorted.mkString(",")}")
    closed.unionByName(ins.select(tgt.columns.map(col).toSeq: _*))
      .withColumn("nk_bucket", bucketOf)
  }
}
