package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hash64

/** Multimodal column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, batched per-partition
  * transforms (decode / frame-sample / feature-extract / dedup).
  *
  * The codecs are REAL, pure-JVM decoders of simple public formats (no
  * native libraries needed):
  *   - image: binary PPM ("P6", netpbm) — header parse + RGB → luma;
  *   - audio: RIFF/WAVE PCM 16-bit mono — chunk walk + RMS level;
  *   - video: a concatenated stream of PPM frames — sequential frame
  *     parse, strided sampling, per-frame luma histograms.
  * `decode` sniffs magic bytes like a real decoder (it does NOT trust the
  * metadata column). Swapping in JPEG/MP4 via JNI/javacv changes only the
  * per-format branch; the Spark-side batching (one reusable digest/codec
  * context per partition, columnar-friendly output, frame explode) is the
  * part the pipeline depends on.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      frames: Int, sampleRateHz: Int)
  final case class MediaRow(mediaId: Long, meta: MediaMeta, payload: Array[Byte])
  /** `level` is the modality's scalar statistic: mean luma in [0,1] for
    * visual media, RMS amplitude in [0,1] for audio.
    */
  final case class DecodedStats(mediaId: Long, kind: String, width: Int,
      height: Int, meanLuma: Double, sha1: String)
  final case class FrameRow(mediaId: Long, frameIdx: Int,
      frameFeature: Array[Float])

  // ------------------------------------------------------------------
  // Encoders (used by the synthesizer) — real file bytes
  // ------------------------------------------------------------------

  /** Binary PPM (P6) with deterministic pseudo-random pixels. */
  def encodePpm(w: Int, h: Int, seed: Long): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h * 3) {
      out(header.length + i) = (Hash64.hashLong(seed * 1000003L + i, 11L) & 0xff).toByte
      i += 1
    }
    out
  }

  /** RIFF/WAVE, PCM 16-bit mono, deterministic pseudo-random samples. */
  def encodeWav(sampleRateHz: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRateHz)
    buf.putInt(sampleRateHz * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort((Hash64.hashLong(seed * 7919L + i, 13L) & 0xffff).toShort)
      i += 1
    }
    buf.array()
  }

  /** Video = frames × PPM blocks, concatenated. */
  def encodeVideo(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] =
    (0 until frames).toArray.flatMap(f => encodePpm(w, h, seed * 31L + f))

  /** One deterministic synthetic media row — the single source of truth
    * shared by the distributed [[synthesize]] map and the SEQUENTIAL
    * fixture generator ([[graft.tools.MediaFixtureGen]]) that freezes the
    * m_* driver-oracle literals, so the two can never drift apart.
    */
  def synthOne(i: Long): MediaRow = {
    val w = 16 + (i % 4).toInt * 8
    val h = 16
    // videos always have ≥2 frames: a 1-frame PPM stream is
    // indistinguishable from (and sniffs as) a plain image
    val frames = 2 + (i % 4).toInt
    (i % 3).toInt match {
      case 0 => MediaRow(i, MediaMeta("image", w, h, 1, 0), encodePpm(w, h, i))
      case 1 =>
        val ns = 256 + (Hash64.hashLong(i, 7L) & 0xff).toInt
        MediaRow(i, MediaMeta("audio", 0, 0, 0, 16000), encodeWav(16000, ns, i))
      case _ => MediaRow(i, MediaMeta("video", w, h, frames, 0),
        encodeVideo(w, h, frames, i))
    }
  }

  /** Deterministic synthetic media table with REAL format payloads
    * (kinds cycle image/audio/video).
    */
  def synthesize(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map(i => synthOne(i))
  }

  // ------------------------------------------------------------------
  // Decoders — parse the actual bytes
  // ------------------------------------------------------------------

  private def lumaOf(r: Int, g: Int, b: Int): Double =
    (0.299 * r + 0.587 * g + 0.114 * b) / 255.0

  /** Parse one PPM block starting at `off`; returns (w, h, pixelOff, end). */
  def parsePpmHeader(bytes: Array[Byte], off: Int): (Int, Int, Int, Int) = {
    require(bytes(off) == 'P' && bytes(off + 1) == '6', "not a P6 PPM")
    var i = off + 2
    val fields = new Array[Int](3)
    var f = 0
    while (f < 3) {
      while (Character.isWhitespace(bytes(i))) i += 1
      var v = 0
      while (!Character.isWhitespace(bytes(i))) { v = v * 10 + (bytes(i) - '0'); i += 1 }
      fields(f) = v; f += 1
    }
    i += 1 // single whitespace after maxval
    val (w, h) = (fields(0), fields(1))
    require(fields(2) == 255, "only 8-bit PPM supported")
    (w, h, i, i + w * h * 3)
  }

  private def ppmMeanLuma(bytes: Array[Byte], pixelOff: Int, w: Int, h: Int): Double = {
    var sum = 0.0
    var i = pixelOff
    val end = pixelOff + w * h * 3
    while (i < end) {
      sum += lumaOf(bytes(i) & 0xff, bytes(i + 1) & 0xff, bytes(i + 2) & 0xff)
      i += 3
    }
    sum / (w * h)
  }

  /** Walk RIFF chunks; returns (sampleRate, rms in [0,1]). */
  def decodeWav(bytes: Array[Byte]): (Int, Double) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes(0) == 'R' && bytes(1) == 'I', "not RIFF")
    var pos = 12
    var sampleRate = 0
    var rms = 0.0
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = buf.getInt(pos + 4)
      if (id == "fmt ") sampleRate = buf.getInt(pos + 12)
      else if (id == "data") {
        var s = 0.0
        var i = pos + 8
        val end = math.min(pos + 8 + len, bytes.length)
        var n = 0
        while (i + 1 < end) {
          val v = buf.getShort(i) / 32768.0
          s += v * v; n += 1; i += 2
        }
        rms = if (n == 0) 0.0 else math.sqrt(s / n)
      }
      pos += 8 + len + (len & 1)
    }
    (sampleRate, rms)
  }

  /** Magic-byte-sniffing decode of one media row. */
  def decodeOne(row: MediaRow, sha1: java.security.MessageDigest): DecodedStats = {
    sha1.reset()
    val digest = graft.pipeline.DedupPipeline.toHex(sha1.digest(row.payload))
    val b = row.payload
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
      // PPM or PPM-stream (video): stat the first frame, count the rest
      val (w, h, pix, end) = parsePpmHeader(b, 0)
      val kind = if (end < b.length) "video" else "image"
      DecodedStats(row.mediaId, kind, w, h, ppmMeanLuma(b, pix, w, h), digest)
    } else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
      val (_, rms) = decodeWav(b)
      DecodedStats(row.mediaId, "audio", 0, 0, rms, digest)
    } else {
      throw new IllegalArgumentException(
        s"media ${row.mediaId}: unrecognized payload magic")
    }
  }

  /** Batched decode: one digest/codec context per partition (the
    * expensive object a real decoder amortizes), columnar-friendly output.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val sha1 = java.security.MessageDigest.getInstance("SHA-1")
      it.map(r => decodeOne(r, sha1))
    }
  }

  /** Integer 8-bin luma histogram of one PPM frame's pixels — the exact
    * counts (shared by [[sampleFrames]] and the sequential fixture
    * generator, so the float feature and the frozen integer oracle derive
    * from one binning).
    */
  def frameHistCounts(b: Array[Byte], pix: Int, w: Int, h: Int): Array[Long] = {
    val hist = new Array[Long](8)
    var i = pix
    val end = pix + w * h * 3
    while (i < end) {
      val l = lumaOf(b(i) & 0xff, b(i + 1) & 0xff, b(i + 2) & 0xff)
      hist(math.min(7, (l * 8).toInt)) += 1L
      i += 3
    }
    hist
  }

  /** Parse a PPM stream into per-frame (w, h, pixelOff) descriptors. */
  def parseFrames(b: Array[Byte]): Array[(Int, Int, Int)] = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var off = 0
    while (off < b.length) {
      val (w, h, pix, end) = parsePpmHeader(b, off)
      frames += ((w, h, pix))
      off = end
    }
    frames.toArray
  }

  /** Frame sampling: parse the PPM stream, take every `stride`-th frame,
    * feature = 8-bin luma histogram of the REAL pixels (normalized).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.kind == "video").flatMap { r =>
      val b = r.payload
      val frames = parseFrames(b)
      (0 until frames.length by stride).iterator.map { f =>
        val (w, h, pix) = frames(f)
        val counts = frameHistCounts(b, pix, w, h)
        val hist = new Array[Float](8)
        var k = 0
        while (k < 8) { hist(k) = counts(k).toFloat / (w * h).toFloat; k += 1 }
        FrameRow(r.mediaId, f, hist)
      }
    }
  }

  final case class ResizedRow(mediaId: Long, kind: String,
      width: Int, height: Int, newWidth: Int, newHeight: Int,
      payload: Array[Byte])

  /** Nearest-neighbor resize of one PPM frame's pixels into a fresh P6
    * payload (aspect preserved, longest side clamped to `maxDim`; images
    * already within the bound copy through unchanged).
    */
  private def resizePpm(b: Array[Byte], maxDim: Int): (Int, Int, Int, Int, Array[Byte]) = {
    val (w, h, pix, _) = parsePpmHeader(b, 0)
    val longest = math.max(w, h)
    if (longest <= maxDim) (w, h, w, h, b)
    else {
      val w2 = math.max(1, (w.toLong * maxDim / longest).toInt)
      val h2 = math.max(1, (h.toLong * maxDim / longest).toInt)
      val header = s"P6\n$w2 $h2\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w2 * h2 * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var y = 0
      while (y < h2) {
        val sy = (y.toLong * h / h2).toInt
        var x = 0
        while (x < w2) {
          val sx = (x.toLong * w / w2).toInt
          val src = pix + (sy * w + sx) * 3
          val dst = header.length + (y * w2 + x) * 3
          out(dst) = b(src); out(dst + 1) = b(src + 1); out(dst + 2) = b(src + 2)
          x += 1
        }
        y += 1
      }
      (w, h, w2, h2, out)
    }
  }

  /** Map-only image resize — the preprocessing step a vision-training
    * pipeline runs over every image shard (decode → scale → re-encode).
    * Nearest-neighbor on the REAL pixels, aspect preserved, longest side
    * clamped to `maxDim`; the output is a valid P6 payload [[decode]]
    * re-parses. Non-image media pass through untouched (a real pipeline
    * routes per modality). Like [[decode]], payload bytes never shuffle —
    * the transform is per-partition with zero row amplification.
    */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedRow] = {
    require(maxDim > 0, s"resize: maxDim must be positive, got $maxDim")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(it => it.map(r => resizeOne(r, maxDim)))
  }

  /** Resize one row — shared by [[resize]] and the sequential fixture
    * generator.
    */
  def resizeOne(r: MediaRow, maxDim: Int): ResizedRow = {
    val b = r.payload
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6' &&
        r.meta.kind == "image") {
      val (w, h, w2, h2, out) = resizePpm(b, maxDim)
      ResizedRow(r.mediaId, "image", w, h, w2, h2, out)
    } else
      ResizedRow(r.mediaId, r.meta.kind, r.meta.width, r.meta.height,
        r.meta.width, r.meta.height, b)
  }

  /** Media-level dedup: exact payload hash groupBy (the binary analog of
    * document exact dedup).
    */
  def exactDedup(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r => (r.mediaId, Hash64.hashBytes(r.payload, 0L)))
      .toDF("mediaId", "payloadHash")
      .groupBy(col("payloadHash"))
      .agg(count(lit(1)).as("copies"), min(col("mediaId")).as("canonical"))
  }
}
