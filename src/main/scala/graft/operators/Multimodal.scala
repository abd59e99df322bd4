package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hash64

/** Multimodal column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, batched per-partition
  * transforms (decode / resize / frame-sample / feature-extract).
  *
  * The actual codec step is STUBBED (image/audio libraries are not in
  * this container): `decodeStub` derives deterministic fake pixel
  * statistics from the payload bytes. Everything Spark-side — schema,
  * partitioning, batch shape, explode of sampled frames — is real and
  * tested; swapping the stub for a JNI/javacv decoder changes one
  * function.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      frames: Int, sampleRateHz: Int)
  final case class MediaRow(mediaId: Long, meta: MediaMeta, payload: Array[Byte])
  final case class DecodedStats(mediaId: Long, kind: String, width: Int,
      height: Int, meanLuma: Double, sha1: String)
  final case class FrameRow(mediaId: Long, frameIdx: Int,
      frameFeature: Array[Float])

  /** Deterministic synthetic media table (payload = seeded pseudo-bytes;
    * kinds cycle image/audio/video).
    */
  def synthesize(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 256 + (Hash64.hashLong(i, 7L) & 0x3ff).toInt
      val payload = Array.tabulate[Byte](len)(j =>
        (Hash64.hashLong(i * 100003L + j, 11L) & 0xff).toByte)
      MediaRow(i,
        MediaMeta(kind, 64 + (i % 4).toInt * 32, 64, 1 + (i % 5).toInt, 16000),
        payload)
    }
  }

  /** ??? in spirit: the codec boundary. Deterministic fake "decode"
    * producing stats a real decoder would produce.
    */
  def decodeStub(row: MediaRow, sha1: java.security.MessageDigest): DecodedStats = {
    var sum = 0L
    row.payload.foreach(b => sum += (b & 0xff))
    sha1.reset()
    DecodedStats(row.mediaId, row.meta.kind, row.meta.width, row.meta.height,
      sum.toDouble / row.payload.length / 255.0,
      graft.pipeline.DedupPipeline.toHex(sha1.digest(row.payload)))
  }

  /** Batched decode: one codec context per partition (the expensive
    * object a real decoder would amortize), columnar-friendly output.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val sha1 = java.security.MessageDigest.getInstance("SHA-1")
      it.map(r => decodeStub(r, sha1))
    }
  }

  /** Frame sampling: every `stride`-th frame of video rows exploded to
    * one row per sampled frame with a stubbed per-frame feature vector.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.kind == "video").flatMap { r =>
      (0 until r.meta.frames by stride).iterator.map { f =>
        val feat = Array.tabulate(8)(d =>
          (Hash64.hashLong(r.mediaId * 131L + f, d.toLong) >>> 40).toFloat / (1 << 24))
        FrameRow(r.mediaId, f, feat)
      }
    }
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
