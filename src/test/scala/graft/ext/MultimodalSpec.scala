package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "tiny"),               // doc_id%3=0 → image
    (1L, "hello world audio"),  // → audio
    (2L, "some video payload")) // → video
    .toDF("doc_id", "text")

  test("media derivation: kind cycle and byte payload (audio = WAV-wrapped)") {
    val m = Multimodal.mediaFromDocuments(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2).length)).toSet
    // audio payload = 44-byte canonical WAV header + the 17 text bytes
    assert(m === Set((0L, "image", 4), (1L, "audio", 61), (2L, "video", 18)))
  }

  test("decodeMeta: stub for image/video text bytes, REAL decode for audio WAV") {
    val meta = Multimodal.decodeMeta(Multimodal.mediaFromDocuments(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    // image n=4: width 64+4%512=68, height 64+28%512=92
    assert(meta(0L).getString(1) === "image")
    assert(meta(0L).getLong(2) === 4L)
    assert(meta(0L).getLong(3) === 68L && meta(0L).getLong(4) === 92L)
    assert(meta(0L).isNullAt(5) && meta(0L).isNullAt(6))
    // audio: 17 data bytes → header sr = 8000+(17%3)*4000 = 16000 Hz,
    // javax.sound.sampled reads it back: 17 frames → 17·1000/16000 = 1 ms
    assert(meta(1L).getLong(2) === 61L)
    assert(meta(1L).getLong(5) === 16000L && meta(1L).getLong(6) === 1L)
    assert(meta(1L).isNullAt(3) && meta(1L).isNullAt(4))
    // video n=18: 320x240, dur 18*13%10000=234
    assert(meta(2L).getLong(3) === 320L && meta(2L).getLong(4) === 240L)
  }

  test("sampleFrames emits inclusive 1s steps for video only") {
    val longDoc = Seq((2L, "x" * 200)).toDF("doc_id", "text") // dur = 2600
    val frames = Multimodal.sampleFrames(
      Multimodal.decodeMeta(Multimodal.mediaFromDocuments(longDoc))).collect()
    assert(frames.map(_.getLong(1)).sorted.toSeq === Seq(0L, 1000L, 2000L))
    assert(frames.map(_.getString(2)).distinct.length === 3)
  }

  test("binaryFile source: kind from extension, payload bytes intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    java.nio.file.Files.write(dir.resolve("a.jpg"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.mp3"), Array[Byte](4, 5))
    java.nio.file.Files.write(dir.resolve("c.mp4"), Array[Byte](6))
    java.nio.file.Files.write(dir.resolve("d.txt"), Array[Byte](7))
    val m = Multimodal.readBinaryDir(spark, dir.toString)
    val byKind = m.collect().map(r =>
      r.getString(1) -> r.getAs[Array[Byte]](2).length).toMap
    assert(byKind === Map("image" -> 3, "audio" -> 2, "video" -> 1, "other" -> 1))
    // ids are stable across reads
    val ids1 = m.select("media_id").collect().map(_.getLong(0)).sorted
    val ids2 = Multimodal.readBinaryDir(spark, dir.toString)
      .select("media_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2))
    // decode plumbing runs over the real source
    val meta = Multimodal.decodeMeta(m.drop("path"))
    assert(meta.count() === 4)
  }

  test("resizeImages: aspect-fit geometry never upscales, digest matches prefix slice") {
    // payload length n drives stub dims: w = 64 + n%512, h = 64 + 7n%512
    // n=10 → 74x134 (fits, untouched); n=400 → 464x* (width- or height-bound)
    val media = Seq(
      (1L, "image", ("x" * 10).getBytes("UTF-8")),
      (2L, "image", ("y" * 400).getBytes("UTF-8")),
      (3L, "audio", ("z" * 400).getBytes("UTF-8")) // non-image: excluded
    ).toDF("media_id", "kind", "payload")
    val r = Multimodal.resizeImages(media).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.size === 2)
    val small = r(1L)
    assert(small.getLong(1) === 74L && small.getLong(2) === 134L)
    assert(small.getLong(3) === 74L && small.getLong(4) === 134L) // untouched
    val big = r(2L)
    val (w, h) = (big.getLong(1), big.getLong(2))
    val (ow, oh) = (big.getLong(3), big.getLong(4))
    assert(w > 256 || h > 256)
    assert(ow <= 256 && oh <= 256 && (ow == 256 || oh == 256))
    // aspect preserved within floor rounding: ow/oh ≈ w/h
    assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.02, s"$ow x $oh vs $w x $h")
    // resized bytes = prefix of payload sized to the output geometry
    val expectBytes = math.min(400L, ow * oh / 64L)
    assert(big.getLong(5) === expectBytes)
    val expectDigest = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(("y" * 400).getBytes("UTF-8").take(expectBytes.toInt))
    assert(big.getString(6) === expectDigest)
  }

  /** A real encoded image: width×height gradient, PNG or JPEG bytes via
    * the in-JDK encoder — the decode side then exercises the same
    * javax.imageio path production payloads would. */
  private def fixtureImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / math.max(1, w - 1)) << 16) |
        ((y * 255 / math.max(1, h - 1)) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("real JPEG/PNG payloads decode via javax.imageio: true dims in meta") {
    val media = Seq(
      (10L, "image", fixtureImage(37, 21, "png")),
      (11L, "image", fixtureImage(640, 480, "jpg")),
      (12L, "image", "not an image at all".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "payload")
    val meta = Multimodal.decodeMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(meta(10L).getLong(3) === 37L && meta(10L).getLong(4) === 21L)
    assert(meta(11L).getLong(3) === 640L && meta(11L).getLong(4) === 480L)
    // undecodable bytes keep the deterministic stub (n=19 → 83 x 197)
    assert(meta(12L).getLong(3) === (64L + 19 % 512))
    assert(meta(12L).getLong(4) === (64L + (19 * 7) % 512))
  }

  test("real resize: decoded, bilinear-scaled, PNG re-encoded at the fit geometry") {
    val media = Seq((20L, "image", fixtureImage(640, 480, "png")))
      .toDF("media_id", "kind", "payload")
    val r = Multimodal.resizeImages(media, maxW = 256, maxH = 256).head()
    assert(r.getLong(1) === 640L && r.getLong(2) === 480L)
    assert(r.getLong(3) === 256L && r.getLong(4) === 192L) // 480*256/640
    // output really is a decodable PNG at the target geometry — fetch the
    // bytes by re-running the deterministic resample on the driver
    val img = Multimodal.decodeImageFull(fixtureImage(640, 480, "png")).get
    val out = Multimodal.resampleReal(img, 256, 192)
    assert(r.getLong(5) === out.length.toLong)
    assert(Multimodal.imageDims(out) === Some((256L, 192L)))
  }

  /** A fixture WAV written by the JDK's OWN encoder (AudioSystem.write),
    * not our columnar builder — decoding it proves the decode path
    * against an independent producer. 16-bit stereo to exercise a frame
    * size ≠ 1 byte. */
  private def fixtureWav(sampleRate: Float, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 2, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    for (i <- pcm.indices) pcm(i) = (i * 31).toByte
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV payloads decode via javax.sound.sampled: true rate + duration") {
    val media = Seq(
      (40L, "audio", fixtureWav(44100f, 22050)),     // 0.5 s stereo
      (41L, "audio", fixtureWav(8000f, 1000)),       // 125 ms
      (42L, "audio", "not audio at all".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "payload")
    val meta = Multimodal.decodeMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(meta(40L).getLong(5) === 44100L && meta(40L).getLong(6) === 500L)
    assert(meta(41L).getLong(5) === 8000L && meta(41L).getLong(6) === 125L)
    // undecodable bytes keep the deterministic stub (n=16 → rate 12000)
    assert(meta(42L).getLong(5) === (8000L + (16 % 3) * 4000))
    assert(meta(42L).getLong(6) === (16L * 13 % 10000))
  }

  test("columnar WAV builder produces bytes the JDK decoder accepts") {
    // the builder is columnar SQL; round-trip its output through
    // audioMeta directly to pin the header layout
    val built = Multimodal.mediaFromDocuments(
        Seq((1L, "hello world audio")).toDF("doc_id", "text"))
      .head().getAs[Array[Byte]](2)
    assert(Multimodal.audioMeta(built) === Some((16000L, 1L)))
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(built))
    assert(aff.getFormat.getSampleSizeInBits === 8)
    assert(aff.getFormat.getChannels === 1)
    assert(aff.getFrameLength === 17)
  }

  test("imageStats: exact luminance stats from lossless PNG pixels") {
    // 2x1 PNG: black pixel + white pixel → min 0, max 255, mean 127.5
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000)
    img.setRGB(1, 0, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      (30L, "image", bos.toByteArray),
      (31L, "image", "plain text".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "payload")
    val st = Multimodal.imageStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(st(30L).getLong(1) === 2L && st(30L).getLong(2) === 1L)
    assert(st(30L).getLong(4) === 0L && st(30L).getLong(5) === 255L)
    assert(math.abs(st(30L).getDouble(3) - 127.5) < 1e-9)
    assert(st(31L).isNullAt(3)) // undecodable → null stats, row kept
  }

  test("extractFeatures: 8 deterministic floats in [0,1)") {
    val f = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(f.values.forall(v => v.length == 8 && v.forall(x => x >= 0.0 && x < 1.0)))
    // determinism across invocations
    val f2 = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(f === f2)
  }

  test("imagePhash stub path: hand-computed code-point signal bands") {
    // 64 'a' (97) then 64 'z' (122): buckets of 2 chars — first 32
    // buckets mean 97, last 32 mean 122; global floor mean 109 →
    // bits 0..31 clear, 32..63 set → bands (0, 0, 0xFFFF, 0xFFFF)
    val text = "a" * 64 + "z" * 64
    val media = Seq((1L, "image", text.getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val r = Multimodal.imagePhash(media).collect()
    assert(r.length === 1)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4)) === ((0L, 0L, 0xFFFFL, 0xFFFFL)))
    // too-short signals are dropped, as are non-images
    val tiny = Seq((2L, "image", "short".getBytes("UTF-8")),
      (3L, "video", text.getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.imagePhash(tiny).count() === 0L)
  }

  test("imagePhash real path: re-encode lands at hamming 0, edits small, inverse far") {
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val halves = png((x, _) => if (x < 32) 0x000000 else 0xFFFFFF)
    // one 8x8 cell's worth of pixels flipped — at most a few bits move
    val edited = png((x, y) =>
      if (x < 8 && y < 8) 0xFFFFFF
      else if (x < 32) 0x000000 else 0xFFFFFF)
    val inverse = png((x, _) => if (x < 32) 0xFFFFFF else 0x000000)
    val media = Seq((1L, "image", halves), (2L, "image", halves),
      (3L, "image", edited), (4L, "image", inverse))
      .toDF("media_id", "kind", "payload")
    val dups = Multimodal.phashNearDups(
        Multimodal.imagePhash(media), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(dups((1L, 2L)) === 0L)   // identical re-encodes
    assert(dups.contains((1L, 3L)) && dups((1L, 3L)) <= 3L)
    assert(!dups.contains((1L, 4L)), s"inverse must not pair: $dups")
  }

  test("scene cuts: a planted two-half video cuts once; uniform video never cuts") {
    import spark.implicits._
    // doc_id % 3 == 2 -> video in mediaFromDocuments; 600 ascii chars ->
    // stub duration 600*13%10000 = 7800ms -> frames 0..7000
    val twoHalf = (2L, "a" * 300 + "z" * 300)
    val uniform = (5L, "m" * 600)
    val media = Multimodal.mediaFromDocuments(
      Seq(twoHalf, uniform).toDF("doc_id", "text"))
    val out = Multimodal.sceneCuts(media, stepMs = 1000L,
      window = 64, threshold = 16L).collect()
    val cutsByMedia = out.groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getAs[Long]("is_cut")).sum).toMap
    assert(cutsByMedia(2L) >= 1L, "the a->z boundary must register a cut")
    assert(cutsByMedia(5L) === 0L, "uniform signal must not cut")
    // first frame of each video carries sad 0 by definition
    out.filter(_.getAs[Long]("frame_ms") == 0L)
      .foreach(r => assert(r.getAs[Long]("sad") === 0L))
  }

  test("scene cuts: sub-window videos are dropped, not fingerprinted") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(
      Seq((2L, "short")).toDF("doc_id", "text"))
    assert(Multimodal.sceneCuts(media).count() === 0L)
  }
}
