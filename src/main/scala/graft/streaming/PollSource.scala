package graft.streaming

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Live polling REST source — the last reference surface without a native
  * twin (S1 live mode: STG_Firebase2Oracle.py:45-59 fetches the whole
  * Firebase RTDB subtree over HTTPS each run and delta-filters
  * client-side on `Timestamp >= prevRunStart`).
  *
  * Spark-first shape: a DataSourceV2 micro-batch stream,
  * `spark.readStream.format("graft-poll")`. Each micro-batch the driver
  * pulls ONE full snapshot through a pluggable [[TreeFetcher]] (HTTP in
  * production, registered fakes in tests — no network in CI), flattens
  * the `{date: {time: record}}` tree, and emits exactly the records the
  * reference's threshold filter would land:
  *
  *  - the offset carries the watermark (max record Timestamp emitted so
  *    far) plus the record keys AT that watermark, so the reference's
  *    `>=` boundary re-fetch (ST2) deduplicates at the source — an
  *    append-mode stream cannot rely on the reference's
  *    DELETE-then-reinsert landing trick, so the boundary record lands
  *    exactly once here and the downstream SCD2 'NC' absorption (ST3)
  *    stays a no-op path rather than a correctness requirement;
  *  - a record with a missing/unparseable Timestamp defaults to epoch at
  *    filter time (F12, STG_Firebase2Oracle.py:57): it lands only while
  *    the watermark is still epoch, exactly as in the reference;
  *  - `pollIntervalMs` rate-limits the endpoint: `latestOffset` returns
  *    the previous offset (no new batch) until the interval elapses —
  *    the streaming analog of the reference's daily cron spacing.
  *
  * Recovery: offsets are engine-checkpointed; a batch replayed after a
  * crash re-fetches the LIVE snapshot and re-slices the (start, end]
  * window best-effort — records still present re-land identically,
  * records deleted upstream are lost, the same guarantee an Airflow
  * retry of the reference's fetch task has against a mutable RTDB.
  *
  * Scale: the snapshot is a bounded per-device subtree that fits the
  * driver by the same argument it fits the reference's Python process;
  * the 100 TB ingest path is the distributed file/tree batch reader
  * (TreeIngest) — this source exists for parity of the LIVE tail.
  */
class PollSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-poll"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PollSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PollTable(properties.asScala.toMap.map { case (k, v) => (k.toLowerCase, v) })
}

object PollSource {
  /** Flattened tree record — same shape TreeIngest.flatten produces, so
    * TreeIngest.toLanding applies unchanged downstream. */
  val schema: StructType = StructType(Seq(
    StructField("date_key", StringType),
    StructField("time_key", StringType),
    StructField("TimeZone", StringType),
    StructField("Humidity", StringType),
    StructField("Temperature", StringType),
    StructField("Timestamp", StringType)))

  val epochStr = "1970-01-01 00:00:00"

  private val tsFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Canonical effective-timestamp string: parseable → normalized (the
    * fixed format sorts lexicographically = chronologically), else epoch
    * (F12 defaulting). */
  def effTs(raw: String): String =
    if (raw == null) epochStr
    else try java.time.LocalDateTime.parse(raw, tsFmt).format(tsFmt)
    catch { case _: java.time.format.DateTimeParseException => epochStr }
}

private[streaming] final case class PollRecord(
    dateKey: String, timeKey: String,
    tz: String, hum: String, temp: String, ts: String) {
  def key: String = dateKey + "|" + timeKey
  def eff: String = PollSource.effTs(ts)
}

class PollTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-poll(${options.getOrElse("transport", "http")})"
  override def schema(): StructType = PollSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PollSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PollMicroBatchStream(options)
      }
    }
}

/** Offset = (poll sequence, watermark, emitted keys at the watermark).
  * The v2 Offset base class compares by json, so the encoding must be
  * deterministic — keys are sorted. */
private[streaming] final case class PollOffset(
    poll: Long, watermark: String, boundary: Seq[String]) extends Offset {
  override def json(): String = {
    val om = new ObjectMapper()
    val node = om.createObjectNode()
    node.put("poll", poll)
    node.put("watermark", watermark)
    val arr = node.putArray("boundary")
    boundary.sorted.foreach(arr.add)
    om.writeValueAsString(node)
  }
}

private[streaming] object PollOffset {
  def fromJson(s: String): PollOffset = {
    val n = new ObjectMapper().readTree(s)
    PollOffset(
      n.get("poll").asLong(),
      n.get("watermark").asText(),
      n.get("boundary").elements().asScala.map(_.asText()).toSeq)
  }
}

class PollMicroBatchStream(options: Map[String, String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val fetcher =
    TreeFetchers.resolve(options.getOrElse("transport", "http"), options)
  private val pollIntervalMs = options.getOrElse("pollintervalms", "1000").toLong
  private val numPartitions = options.getOrElse("numpartitions", "4").toInt
  private val startAt = PollSource.effTs(options.getOrElse("startat", PollSource.epochStr))

  // driver-only mutable state (MicroBatchStream lives on the driver)
  private val pending = TrieMap.empty[Long, Array[PollRecord]]
  private var last: PollOffset = PollOffset(0L, startAt, Seq.empty)
  private var lastPollAtMs = Long.MinValue
  private var availableNowPending = false
  private var availableNowTarget: Option[PollOffset] = None

  /** After a restart the engine's view of progress arrives as the `start`
    * offset of `latestOffset(start, limit)` — a fresh instance must adopt
    * it as the delta base or it would re-emit the whole snapshot. */
  private def syncBase(start: PollOffset): Unit = synchronized {
    if (start.poll > last.poll) last = start
  }

  override def initialOffset(): Offset = PollOffset(0L, startAt, Seq.empty)
  override def deserializeOffset(json: String): Offset = PollOffset.fromJson(json)

  /** One rate-limited snapshot pull; advances the offset only when fresh
    * records exist (same offset ⇒ the engine plans no batch). */
  private def computeLatest(force: Boolean): PollOffset = synchronized {
    val now = System.currentTimeMillis()
    if (!force && lastPollAtMs != Long.MinValue && now - lastPollAtMs < pollIntervalMs) return last
    lastPollAtMs = now
    val all = PollTreeJson.parse(fetcher.fetch())
    val fresh = all.filter(r => inWindowLow(r, last))
    if (fresh.isEmpty) return last
    val newWm = fresh.iterator.map(_.eff).max
    val freshAtWm = fresh.filter(_.eff == newWm).map(_.key)
    // boundary keys SORTED at construction: PollOffset is a case class,
    // so its equals compares the Seq element-wise (shadowing the v2
    // Offset base's json equality) — an unsorted in-memory offset would
    // spuriously differ from its own checkpoint round-trip (fromJson
    // yields the sorted form) and fake an offset change on restart
    val newBoundary =
      (if (newWm == last.watermark) last.boundary ++ freshAtWm
       else freshAtWm.toSeq).sorted
    val next = PollOffset(last.poll + 1L, newWm, newBoundary)
    pending.put(next.poll, fresh)
    last = next
    next
  }

  /** record strictly after `lo` in (watermark, boundary-key) order —
    * i.e. the reference's `ts >= threshold` minus already-emitted
    * boundary records. The boundary is probed as a Set: a snapshot where
    * every record shares one timestamp makes the boundary list
    * snapshot-sized, and a Seq.contains would turn the filter
    * quadratic. */
  private def inWindowLow(r: PollRecord, lo: PollOffset): Boolean = {
    lazy val b = boundarySet(lo)
    r.eff > lo.watermark || (r.eff == lo.watermark && !b(r.key))
  }

  private def inWindowHigh(r: PollRecord, hi: PollOffset): Boolean = {
    lazy val b = boundarySet(hi)
    r.eff < hi.watermark || (r.eff == hi.watermark && b(r.key))
  }

  // tiny per-offset memo so the snapshot filter probes a Set, not a Seq
  private val boundaryMemo = TrieMap.empty[(Long, String), Set[String]]
  private def boundarySet(o: PollOffset): Set[String] =
    boundaryMemo.getOrElseUpdate((o.poll, o.watermark), o.boundary.toSet)

  // --- admission control / AvailableNow ---
  // prepare() runs before the engine reveals the restored start offset,
  // so the one-shot target fetch is deferred to the first
  // latestOffset(start, _) call, after syncBase.
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowPending = true
    availableNowTarget = None
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    syncBase(start.asInstanceOf[PollOffset])
    if (availableNowPending) {
      availableNowTarget = Some(computeLatest(force = true))
      availableNowPending = false
    }
    availableNowTarget.getOrElse(computeLatest(force = false))
  }
  override def latestOffset(): Offset =
    availableNowTarget.getOrElse(computeLatest(force = false))
  override def reportLatestOffset(): Offset = synchronized(last)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PollOffset]
    val e = end.asInstanceOf[PollOffset]
    if (e.poll <= s.poll) return Array.empty
    val rows: Array[PollRecord] =
      if (e.poll == s.poll + 1 && pending.contains(e.poll)) pending(e.poll)
      else {
        // restart/replay (or a multi-poll range after recovery): the
        // stashed batch is gone — re-fetch the live snapshot and slice
        // the (start, end] window best-effort (see class doc).
        PollTreeJson.parse(fetcher.fetch())
          .filter(r => inWindowLow(r, s) && inWindowHigh(r, e))
      }
    val n = math.max(1, math.min(numPartitions, rows.length))
    (0 until n).map { i =>
      PollPartition(rows.zipWithIndex.collect { case (r, j) if j % n == i => r })
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = new PollReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[PollOffset]
    pending.keys.filter(_ <= e.poll).foreach(pending.remove)
    // the committed offset itself stays memoized — it is the next delta base
    boundaryMemo.keys.filter(_._1 < e.poll).foreach(boundaryMemo.remove)
  }

  override def stop(): Unit = { pending.clear(); boundaryMemo.clear() }
}

/** Driver-side tree flatten: the Jackson twin of TreeIngest.flatten's
  * two map explodes (S2). */
private[streaming] object PollTreeJson {
  def parse(text: String): Array[PollRecord] = {
    val root = new ObjectMapper().readTree(text)
    if (root == null || !root.isObject) return Array.empty
    val out = Array.newBuilder[PollRecord]
    root.fields().asScala.foreach { dateEntry =>
      val (dateKey, times) = (dateEntry.getKey, dateEntry.getValue)
      if (times.isObject) times.fields().asScala.foreach { timeEntry =>
        val rec = timeEntry.getValue
        def s(f: String): String = {
          val v = rec.get(f)
          if (v == null || v.isNull) null else v.asText()
        }
        out += PollRecord(dateKey, timeEntry.getKey,
          s("TimeZone"), s("Humidity"), s("Temperature"), s("Timestamp"))
      }
    }
    out.result()
  }
}

private[streaming] final case class PollPartition(rows: Array[PollRecord]) extends InputPartition

private[streaming] final class PollReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[PollPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val r = rows(i)
        def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
        InternalRow(u(r.dateKey), u(r.timeKey), u(r.tz), u(r.hum), u(r.temp), u(r.ts))
      }
      override def close(): Unit = ()
    }
  }
}
