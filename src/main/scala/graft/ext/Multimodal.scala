package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star): image/audio/video as opaque
  * BINARY columns with typed metadata, decoded/feature-extracted through
  * a partition-wise batch path.
  *
  * The decode step is a STUB — no codec libraries ship in this
  * environment — but it is a DETERMINISTIC stub (pure function of the
  * payload bytes), so the whole Spark-side contract is real and testable:
  * schema, binary transport, mapPartitions batching, partition sizing.
  * Swap `decodeStub` for a real JNI/codec call and nothing else changes.
  * (A PySpark front-end would reach the same operator via mapInPandas;
  * the Scala-native batch path here is the engine-level equivalent.)
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  val metaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Real binary-file source: one row per file with the payload as a
    * BINARY column, kind inferred from the extension. This is the actual
    * 100 TB ingestion path (an object-store listing behind the same
    * format); `mediaFromDocuments` below is its deterministic test twin.
    * `pathGlobFilter`/`recursiveFileLookup` options apply as usual. */
  def readBinaryDir(spark: SparkSession, path: String): DataFrame = {
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    spark.read.format("binaryFile").load(path)
      .select(
        // stable id: 63-bit hash of the file path
        pmod(xxhash64(col("path")), lit(Long.MaxValue)).as("media_id"),
        when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
          .when(ext.isin("mp3", "wav", "flac", "ogg"), "audio")
          .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
          .otherwise("other").as("kind"),
        col("content").as("payload"),
        col("path"))
  }

  /** Derive a deterministic media table from `documents` (payload =
    * UTF-8 bytes of the text; kind cycles image/audio/video). Stands in
    * for [[readBinaryDir]] over an object store. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** ===== STUB ===== deterministic fake decode: metadata as pure
    * functions of payload length. A real implementation parses headers /
    * calls a codec here; everything around it is production plumbing. */
  def decodeStub(kind: String, payload: Array[Byte]): (Option[Long], Option[Long], Option[Long], Option[Long]) = {
    val n = payload.length.toLong
    kind match {
      case "image" => (Some(64L + n % 512), Some(64L + (n * 7) % 512), None, None)
      case "audio" => (None, None, Some(8000L + (n % 3) * 4000), Some(n * 13 % 10000))
      case "video" => (Some(320L), Some(240L), None, Some(n * 13 % 10000))
      case _ => (None, None, None, None)
    }
  }

  /** Partition-wise decode: iterator-in/iterator-out, constant memory per
    * partition — the Scala analog of a Pandas-UDF batch loop. At 100 TB:
    * size partitions by `spark.sql.files.maxPartitionBytes` so a
    * partition's payloads fit an executor's decode buffer. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(metaSchema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          val (w, h, sr, dur) = decodeStub(kind, payload)
          Row(id, kind, payload.length.toLong,
            w.orNull, h.orNull, sr.orNull, dur.orNull)
        }
      }(enc)
  }

  /** Frame sampling for video media: one row per sampled frame offset
    * (every `stepMs`), id = digest of (media_id, offset). Declarative
    * explode — the generator runs inside codegen, no shuffle. */
  def sampleFrames(meta: DataFrame, stepMs: Long = 1000L): DataFrame =
    meta.filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(stepMs))).as("frame_ms"))
      .withColumn("frame_id",
        md5(concat(col("media_id").cast("string"), lit(":"), col("frame_ms").cast("string"))))

  /** Audio analysis windows: one row per overlapping window (`hopMs`
    * apart, `windowMs` long, truncated at the clip end) with the sample
    * count a feature extractor would read. Declarative explode like
    * [[sampleFrames]] — codegen generator, no shuffle. floor() is applied
    * explicitly before the integer cast (engines disagree on
    * double→bigint rounding, not on floor). */
  def sampleAudioWindows(meta: DataFrame, windowMs: Long = 250L,
      hopMs: Long = 100L): DataFrame =
    meta.filter(col("kind") === "audio" && col("duration_ms") > 0)
      .select(col("media_id"), col("sample_rate"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(hopMs))).as("window_ms"))
      .select(col("media_id"), col("window_ms"),
        floor(col("sample_rate") *
            least(lit(windowMs), col("duration_ms") - col("window_ms")) / 1000.0)
          .cast("long").as("n_samples"))

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("in_w", LongType, nullable = false),
    StructField("in_h", LongType, nullable = false),
    StructField("out_w", LongType, nullable = false),
    StructField("out_h", LongType, nullable = false),
    StructField("out_bytes", LongType, nullable = false),
    StructField("out_digest", StringType, nullable = true)))

  /** ===== STUB ===== fake resample: the "resized" payload is a prefix
    * slice sized to the output geometry. A real implementation decodes,
    * filters, and re-encodes here. */
  def resampleStub(payload: Array[Byte], outW: Long, outH: Long): Array[Byte] =
    payload.take(math.min(payload.length.toLong, outW * outH / 64L).toInt)

  /** Image resize plumbing: fit each image inside (maxW, maxH) preserving
    * aspect ratio, never upscaling. Geometry is exact integer arithmetic
    * (cross-multiplied axis choice, floor division — no float scale
    * factor to diverge between engines). The decode→resample→digest pass
    * runs iterator-style per partition like [[decodeMeta]], constant
    * memory; only geometry + a digest of the resized bytes leave the
    * executor, never the pixels — which is what keeps a 100 TB resize
    * job's shuffle at metadata width. */
  def resizeImages(media: DataFrame, maxW: Long = 256L,
      maxH: Long = 256L): DataFrame = {
    require(maxW > 0 && maxH > 0, s"need positive bounds, got $maxW x $maxH")
    val enc = RowEncoder.encoderFor(resizedSchema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .filter(col("kind") === "image")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          val (wOpt, hOpt, _, _) = decodeStub("image", payload)
          val w = wOpt.get
          val h = hOpt.get
          val (ow, oh) =
            if (w <= maxW && h <= maxH) (w, h) // never upscale
            else if (w * maxH >= h * maxW)     // width-bound
              (maxW, math.max(1L, h * maxW / w))
            else                               // height-bound
              (math.max(1L, w * maxH / h), maxH)
          val out = resampleStub(payload, ow, oh)
          val digest = org.apache.commons.codec.digest.DigestUtils.md5Hex(out)
          Row(id, w, h, ow, oh, out.length.toLong, digest)
        }
      }(enc)
  }

  /** "Feature extraction" over decoded media — stub embedding = 8 hash
    * floats of the payload digest; the batching/shape contract is what a
    * real model-inference UDF must satisfy. */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      transform(sequence(lit(0), lit(7)),
        i => (Hashing.hexInt(concat(md5(col("payload")), i.cast("string"))) % 1000)
          .cast("double") / 1000.0).as("features"))
}
