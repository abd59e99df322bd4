package graft.tools

import graft.operators.Multimodal

/** Regenerates `src/main/scala/graft/MediaFixtures.scala` — the frozen
  * driver-oracle literals for the m_* multimodal queries.
  *
  * Runs the media generator + codecs SEQUENTIALLY (no Spark session), so
  * the fixture derives from the same `synthOne`/`decodeOne`/`resizeOne`/
  * `frameHistCounts` scalar code the distributed queries call — the
  * MultimodalSpec self-consistency test re-derives these values and
  * asserts equality with the committed file, so an engine change that
  * moves any value fails the suite instead of silently drifting the
  * oracle.
  *
  * Usage: sbt "Test/runMain graft.tools.MediaFixtureGen [outPath]"
  */
object MediaFixtureGen {

  val N = 200L
  val MaxDim = 12

  def lumaPpm(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  /** (media_id, luma_ppm, sha1) VALUES rows for all N media. */
  def mediaStatsRows(): Seq[String] = {
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    (0L until N).map { i =>
      val d = Multimodal.decodeOne(Multimodal.synthOne(i), sha1)
      s"($i, ${lumaPpm(d.meanLuma)}, '${d.sha1}')"
    }
  }

  /** (media_id, bytes) for audio rows — payload length is hash-dependent
    * (sample count = 256 + (xxh64(i) & 0xff)), so not SQL-closed-form.
    */
  def audioBytesRows(): Seq[String] =
    (0L until N).filter(_ % 3 == 1).map { i =>
      s"($i, ${Multimodal.synthOne(i).payload.length})"
    }

  /** (media_id, rl_ppm) — mean luma of the RESIZED image payload. */
  def resizedLumaRows(): Seq[String] = {
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    (0L until N).filter(_ % 3 == 0).map { i =>
      val rz = Multimodal.resizeOne(Multimodal.synthOne(i), MaxDim)
      val d = Multimodal.decodeOne(
        Multimodal.MediaRow(rz.mediaId,
          Multimodal.MediaMeta("image", rz.newWidth, rz.newHeight, 1, 0),
          rz.payload), sha1)
      s"($i, ${lumaPpm(d.meanLuma)})"
    }
  }

  /** (media_id, frame_idx, b0..b7) integer luma-histogram counts for the
    * stride-2 sampled frames of every video.
    */
  def frameHistRows(): Seq[String] =
    (0L until N).filter(_ % 3 == 2).flatMap { i =>
      val r = Multimodal.synthOne(i)
      val frames = Multimodal.parseFrames(r.payload)
      (0 until frames.length by 2).map { f =>
        val (w, h, pix) = frames(f)
        val c = Multimodal.frameHistCounts(r.payload, pix, w, h)
        s"($i, $f, ${c.mkString(", ")})"
      }
    }

  def render(): String = {
    val header =
      """package graft
        |
        |/** GENERATED driver-oracle fixtures for the m_* multimodal queries —
        |  * regenerate with `sbt "Test/runMain graft.tools.MediaFixtureGen"`.
        |  *
        |  * Each val is the body of a DuckDB VALUES list. The payload content
        |  * is deterministic (xxHash64-seeded codecs), so these literals are a
        |  * frozen contract: the oracle recomputes every STRUCTURAL column
        |  * (kind, dims, resize geometry, passthrough byte sizes, frame
        |  * sampling grid) in closed-form SQL from range(200) and joins these
        |  * content stats; MultimodalSpec re-derives all four tables from the
        |  * sequential scalar codecs each run and asserts equality, so the
        |  * fixture cannot drift from the engine.
        |  */
        |object MediaFixtures {
        |""".stripMargin
    def block(name: String, rows: Seq[String]): String =
      s"""  val $name: String =
         |    \"\"\"${rows.mkString(",\n      |")}\"\"\".stripMargin
         |""".stripMargin
    header +
      block("mediaStats", mediaStatsRows()) + "\n" +
      block("audioBytes", audioBytesRows()) + "\n" +
      block("resizedLuma", resizedLumaRows()) + "\n" +
      block("frameHists", frameHistRows()) + "\n}\n"
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0)
      else "src/main/scala/graft/MediaFixtures.scala"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), render())
    println(s"wrote $out")
  }
}
