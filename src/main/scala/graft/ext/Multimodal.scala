package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star): image/audio/video as opaque
  * BINARY columns with typed metadata, decoded/feature-extracted through
  * a partition-wise batch path.
  *
  * IMAGES and AUDIO decode for real: `javax.imageio` ships in the JDK
  * (JPEG / PNG / GIF / BMP readers), so [[imageDims]] reads true geometry
  * from the payload header and [[resizeImages]] runs an actual
  * decode→rescale→re-encode on decodable payloads; `javax.sound.sampled`
  * likewise ships WAV / AIFF / AU readers, so [[audioMeta]] reads true
  * sample rate + duration from the container header. Payloads no in-JDK
  * codec accepts (and all video — no codec libraries ship in this
  * environment) fall back to [[decodeStub]], a DETERMINISTIC stand-in
  * (pure function of the payload bytes), so the Spark-side contract —
  * schema, binary transport, mapPartitions batching, partition sizing —
  * is identical on both paths. Swap the stub for a JNI/codec call and
  * nothing else changes. (A PySpark front-end would reach the same
  * operator via mapInPandas; the Scala-native batch path here is the
  * engine-level equivalent.)
  */
object Multimodal {

  /** True image geometry from the payload via javax.imageio — HEADER
    * read only (ImageReader.getWidth/getHeight), never a full pixel
    * decode: at 100 TB a metadata pass must not decompress every image.
    * None when no installed codec recognizes the bytes. */
  def imageDims(payload: Array[Byte]): Option[(Long, Long)] = {
    if (payload == null || payload.length == 0) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0).toLong, r.getHeight(0).toLong))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Full pixel decode (BufferedImage) — the expensive path, used only
    * where pixels are actually needed (resize, stats). */
  def decodeImageFull(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.length == 0) None
    else try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** True audio parameters via javax.sound.sampled — HEADER read only
    * (`AudioSystem.getAudioFileFormat` parses the container header, never
    * the sample data), the audio twin of [[imageDims]]. The JDK ships
    * WAV / AIFF / AU readers; (sample_rate, duration_ms) with duration =
    * frames·1000/rate in exact integer arithmetic. None when no JDK
    * reader recognizes the bytes or the header omits the frame count. */
  def audioMeta(payload: Array[Byte]): Option[(Long, Long)] = {
    if (payload == null || payload.length == 0) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val sr = aff.getFormat.getSampleRate
      val frames = aff.getFrameLength.toLong
      if (sr > 0 && frames >= 0)
        Some((sr.toLong, frames * 1000L / sr.toLong))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

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

  /** Little-endian unsigned integer → `nBytes` raw bytes, columnar (hex
    * per byte + one unhex — stays inside codegen, no UDF). */
  private def leBytes(v: Column, nBytes: Int): Column =
    unhex(concat((0 until nBytes).map(i =>
      lpad(hex(pmod(shiftright(v, 8 * i), lit(256))), 2, "0")): _*))

  /** A canonical 44-byte-header PCM WAV wrapping `data` as 8-bit unsigned
    * mono samples at `sampleRate` — built ENTIRELY from columnar byte ops
    * so the fixture is reproducible by any engine (the DuckDB oracle
    * assembles the identical blob). One byte per frame, so frame count =
    * data length and duration falls out exactly. */
  def wavPayload(data: Column, sampleRate: Column): Column = {
    val n = length(data)
    concat(
      lit("RIFF".getBytes("US-ASCII")), leBytes(n + lit(36), 4),
      lit("WAVEfmt ".getBytes("US-ASCII")), leBytes(lit(16), 4),
      leBytes(lit(1), 2), leBytes(lit(1), 2),          // PCM, mono
      leBytes(sampleRate, 4), leBytes(sampleRate, 4),  // rate, byteRate (1 B/frame)
      leBytes(lit(1), 2), leBytes(lit(8), 2),          // blockAlign, bits
      lit("data".getBytes("US-ASCII")), leBytes(n, 4), data)
  }

  /** Derive a deterministic media table from `documents` (kind cycles
    * image/audio/video by doc_id). Image/video payloads are the raw
    * UTF-8 text bytes; AUDIO payloads are a real PCM WAV wrapping those
    * bytes as samples ([[wavPayload]]), so [[decodeMeta]]'s
    * javax.sound.sampled branch decodes them for REAL and the oracle
    * independently checks the decoder's output against the parameters
    * the header embeds. Stands in for [[readBinaryDir]] over an object
    * store. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val data = encode(col("text"), "UTF-8")
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    val sr = lit(8000) + pmod(length(data), lit(3)) * lit(4000)
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      when(kind === "audio", wavPayload(data, sr))
        .otherwise(data).as("payload"))
  }

  /** ===== STUB ===== deterministic fallback decode for payloads no
    * in-JDK codec accepts (and for video, which has no in-JDK codec at
    * all): metadata as pure functions of payload length. */
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
          // image/audio payloads a JDK codec recognizes decode for REAL
          // (header-only reads on both paths); everything else — video
          // and unrecognized bytes — falls back to the deterministic stub
          val (w, h, sr, dur) = kind match {
            case "image" => imageDims(payload) match {
              case Some((rw, rh)) => (Some(rw), Some(rh), None, None)
              case None => decodeStub(kind, payload)
            }
            case "audio" => audioMeta(payload) match {
              case Some((rate, ms)) => (None, None, Some(rate), Some(ms))
              case None => decodeStub(kind, payload)
            }
            case _ => decodeStub(kind, payload)
          }
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

  /** ===== STUB ===== fake resample for undecodable payloads: the
    * "resized" payload is a prefix slice sized to the output geometry. */
  def resampleStub(payload: Array[Byte], outW: Long, outH: Long): Array[Byte] =
    payload.take(math.min(payload.length.toLong, outW * outH / 64L).toInt)

  /** Real resample: decode, bilinear-scale into the target geometry, and
    * re-encode as PNG (deterministic in-JDK encoder — no timestamps or
    * metadata chunks). Pixel work stays inside the executor; only the
    * re-encoded bytes' length + digest leave [[resizeImages]]. */
  def resampleReal(img: java.awt.image.BufferedImage,
      outW: Long, outH: Long): Array[Byte] = {
    val dst = new java.awt.image.BufferedImage(
      outW.toInt, outH.toInt, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, outW.toInt, outH.toInt, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

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
          val real = decodeImageFull(payload)
          val (w, h) = real match {
            case Some(img) => (img.getWidth.toLong, img.getHeight.toLong)
            case None =>
              val (wOpt, hOpt, _, _) = decodeStub("image", payload)
              (wOpt.get, hOpt.get)
          }
          val (ow, oh) =
            if (w <= maxW && h <= maxH) (w, h) // never upscale
            else if (w * maxH >= h * maxW)     // width-bound
              (maxW, math.max(1L, h * maxW / w))
            else                               // height-bound
              (math.max(1L, w * maxH / h), maxH)
          val out = real match {
            case Some(img) => resampleReal(img, ow, oh)
            case None => resampleStub(payload, ow, oh)
          }
          val digest = org.apache.commons.codec.digest.DigestUtils.md5Hex(out)
          Row(id, w, h, ow, oh, out.length.toLong, digest)
        }
      }(enc)
  }

  val imageStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("mean_lum", DoubleType, nullable = true),
    StructField("min_lum", LongType, nullable = true),
    StructField("max_lum", LongType, nullable = true)))

  /** Per-image pixel statistics from REAL decoded bytes: mean/min/max
    * 8-bit luminance (integer BT.601 weights — deterministic, no float
    * accumulation). Null stats for payloads no JDK codec decodes. This
    * is a full pixel decode — at 100 TB run it after metadata filtering,
    * not as the first pass. */
  def imageStats(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageStatsSchema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .filter(col("kind") === "image")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          decodeImageFull(payload) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0L; var mn = 255L; var mx = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val lum = (299L * ((rgb >> 16) & 0xFF) +
                    587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)) / 1000L
                  sum += lum
                  if (lum < mn) mn = lum
                  if (lum > mx) mx = lum
                  x += 1
                }
                y += 1
              }
              Row(id, w.toLong, h.toLong,
                sum.toDouble / (w.toLong * h), mn, mx)
            case None => Row(id, null, null, null, null, null)
          }
        }
      }(enc)
  }

  val phashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("pb0", LongType, nullable = false),
    StructField("pb1", LongType, nullable = false),
    StructField("pb2", LongType, nullable = false),
    StructField("pb3", LongType, nullable = false)))

  /** 64-bit bands from a 64-value signal: bit_i = signal_i > the floor
    * mean of the WHOLE signal; packed as 4×16-bit ints (bits 16b..16b+15)
    * so banding and hamming never touch a sign bit in either engine. */
  private def aHashBands(vals: Array[Long], total: Long,
      cnt: Long): (Long, Long, Long, Long) = {
    val gm = total / cnt
    def band(b: Int): Long = {
      var v = 0L; var i = 0
      while (i < 16) { if (vals(b * 16 + i) > gm) v |= (1L << i); i += 1 }
      v
    }
    (band(0), band(1), band(2), band(3))
  }

  /** Perceptual average-hash per image (aHash — the classic 8×8
    * mean-threshold fingerprint): near-identical images (re-encodes,
    * light crops/edits, brightness-preserving transforms) land within a
    * few bits, which makes image NEAR-dup detection a hash problem
    * instead of a pixel-compare problem.
    *
    * Real path (JDK-decodable payloads): 8×8 grid of integer-mean
    * BT.601 luminances over the decoded pixels (floor cell bounds —
    * exact integers, no float resample in the fingerprint). Stub path
    * (payloads no codec accepts): the payload's UTF-8 code-point
    * sequence bucketed into 64 equal floor-bound spans, per-span floor
    * mean — a 1-D average-hash over a signal the DuckDB oracle
    * recomputes exactly. Signals shorter than 64 (chars or a <8×8
    * image) are dropped as too small to fingerprint.
    *
    * Scale: decode confined to mapPartitions (same contract as
    * [[decodeMeta]]); only (id, 4 small ints) ever leaves the executor
    * — the shuffle for a 100 TB image corpus is fingerprint-width. */
  def imagePhash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(phashSchema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .filter(col("kind") === "image")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          decodeImageFull(payload) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              if (w < 8 || h < 8) None
              else {
                val vals = new Array[Long](64)
                var total = 0L
                var by = 0
                while (by < 8) {
                  var bx = 0
                  while (bx < 8) {
                    var sum = 0L; var n = 0L
                    var y = by * h / 8
                    while (y < (by + 1) * h / 8) {
                      var x = bx * w / 8
                      while (x < (bx + 1) * w / 8) {
                        val rgb = img.getRGB(x, y)
                        sum += (299L * ((rgb >> 16) & 0xFF) +
                          587L * ((rgb >> 8) & 0xFF) +
                          114L * (rgb & 0xFF)) / 1000L
                        n += 1; x += 1
                      }
                      y += 1
                    }
                    vals(by * 8 + bx) = sum / n
                    total += sum
                    bx += 1
                  }
                  by += 1
                }
                val (b0, b1, b2, b3) =
                  aHashBands(vals, total, w.toLong * h)
                Some(Row(id, b0, b1, b2, b3))
              }
            case None =>
              val cps = new String(payload, "UTF-8").codePoints().toArray
              val n = cps.length.toLong
              if (n < 64) None
              else {
                val vals = new Array[Long](64)
                var total = 0L
                var b = 0
                while (b < 64) {
                  var sum = 0L
                  var i = (b * n / 64).toInt
                  val end = ((b + 1) * n / 64).toInt
                  val cnt = end - i
                  while (i < end) { sum += cps(i); i += 1 }
                  vals(b) = sum / cnt
                  total += sum
                  b += 1
                }
                val (b0, b1, b2, b3) = aHashBands(vals, total, n)
                Some(Row(id, b0, b1, b2, b3))
              }
          }
        }
      }(enc)
  }

  /** Image near-dup pairs by perceptual-hash hamming distance ≤ maxDist,
    * candidates via 16-bit band equality over the 4 [[imagePhash]]
    * bands — any band equal ⇒ candidate, so recall is GUARANTEED for
    * distance ≤ 3 by pigeonhole (3 flipped bits touch at most 3 of the
    * 4 bands). Equi-join on (band, value), never an image product; the
    * exact hamming filter is 4 codegen bit_counts. */
  def phashNearDups(ph: DataFrame, maxDist: Int = 3): DataFrame = {
    val banded = ph.select(col("media_id").as("id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), col(s"pb$b").as("bv"))): _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bv"))
    val cands = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bv") === col("r.bv") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val a = ph.select(col("media_id").as("id_a") +:
      (0 until 4).map(i => col(s"pb$i").as(s"a$i")): _*)
    val b = ph.select(col("media_id").as("id_b") +:
      (0 until 4).map(i => col(s"pb$i").as(s"b$i")): _*)
    cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        (0 until 4).map(i =>
          bit_count(col(s"a$i").bitwiseXOR(col(s"b$i"))).cast("long"))
          .reduce(_ + _).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Shot-boundary (scene-cut) detection over sampled video frames —
    * the sum-of-absolute-differences luma detector every video curation
    * pipeline runs before frame-level dedup/captioning: each sampled
    * frame reduces to 4 span-mean luminances, and a frame whose SAD
    * against the previous frame reaches `threshold` starts a new shot.
    *
    * Frames use [[sampleFrames]]' generator inlined so `duration_ms`
    * rides alongside each frame row — a join back to the metadata (the
    * first cut) would re-run the decode pass and shuffle for a column
    * the explode already had in hand. The frame SIGNAL is the
    * deterministic stub decode (the video payload's
    * char-window at the frame's time offset — a pure function of the
    * payload the oracle recomputes exactly; a real codec would hand the
    * same 4 numbers per frame to the identical downstream plan). All
    * frame math is integer floor arithmetic; the lag window partitions
    * BY MEDIA over its own ≤ duration/step frames — bounded frames,
    * never corpus-wide.
    *
    * Scale: explode frames (codegen Generate) → per-frame projection →
    * one media-keyed window. Only (id, 4 longs) per frame ever
    * shuffles. */
  def sceneCuts(media: DataFrame, stepMs: Long = 1000L,
      window: Int = 64, threshold: Long = 16L): DataFrame = {
    require(window % 4 == 0 && window > 0, "window must be a positive multiple of 4")
    val span = window / 4
    val dec = "decimal(38,0)"
    // restrict BEFORE decodeMeta: the frame chain only reads video rows,
    // and video payloads only ever hit the stub — images/audio would
    // attempt real JDK codec decodes for metadata nothing downstream uses
    // (they fail fast on synthetic bytes, but on a real corpus that is a
    // full header read per image for nothing)
    val meta = decodeMeta(media.filter(col("kind") === "video"))
    // sampleFrames' generator with duration_ms projected through — one
    // decode pass, zero meta self-join
    val frames = meta
      .filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms"), lit(stepMs)))
          .as("frame_ms"))
    val sigBase = media.filter(col("kind") === "video")
      .select(col("media_id"), decode(col("payload"), "UTF-8").as("sig0"))
    val num = col("frame_ms").cast(dec) *
      (col("lch") - lit(window.toLong)).cast(dec)
    val den = greatest(col("duration_ms"), lit(1L)).cast(dec)
    val start = (lit(1L).cast(dec) + (num - pmod(num, den)) / den).cast("int")
    val sig = frames.join(sigBase, Seq("media_id"))
      .withColumn("lch", length(col("sig0")).cast("long"))
      .filter(col("lch") >= window.toLong)
      .withColumn("sig", col("sig0").substr(start, lit(window)))
      .withColumn("cps", transform(sequence(lit(1), lit(window)),
        i => ascii(col("sig").substr(i, lit(1))).cast("long")))
    val withMeans = (0 until 4).foldLeft(sig) { (df, b) =>
      val s = aggregate(slice(col("cps"), b * span + 1, span),
        lit(0L), (a, x) => a + x)
      // span divides the sum exactly after the mod strip; the long/long
      // `/` detours through double but the value is an exact small int
      df.withColumn(s"m$b",
        ((s - pmod(s, lit(span.toLong))) / lit(span.toLong)).cast("long"))
    }
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_ms"))
    val sad = (0 until 4)
      .map(b => abs(col(s"m$b") - lag(col(s"m$b"), 1).over(w)))
      .reduce(_ + _)
    withMeans
      .select(col("media_id"), col("frame_ms"),
        col("m0"), col("m1"), col("m2"), col("m3"))
      .withColumn("sad", coalesce(sad, lit(0L)))
      .withColumn("is_cut",
        (col("sad") >= threshold).cast("int").cast("long"))
  }

  /** "Feature extraction" over decoded media — stub embedding = 8 hash
    * floats of the payload digest; the batching/shape contract is what a
    * real model-inference UDF must satisfy. The digest runs over the HEX
    * rendering of the bytes (identical in any engine; VARCHAR-only
    * digest functions — DuckDB's md5 — can then verify arbitrary binary
    * payloads, WAV headers included). */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      transform(sequence(lit(0), lit(7)),
        i => (Hashing.hexInt(concat(md5(hex(col("payload"))), i.cast("string"))) % 1000)
          .cast("double") / 1000.0).as("features"))
}
