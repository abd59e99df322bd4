package graft.tools

import graft.chunking._
import java.nio.file.{Files, Paths}

/** Manual end-to-end drive of the chunking library over a real file.
  * Run: sbt "Test/runMain graft.tools.DriveChunkers [path]"
  */
object DriveChunkers {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/opt/spark/jars/spark-catalyst_2.13-4.1.2.jar")
    val bytes = Files.readAllBytes(Paths.get(path))
    println(s"input: $path (${bytes.length} bytes)")
    for (algo <- Seq("fastcdc", "rabin", "normalized_rabin", "tttd", "ae", "fixed")) {
      val cfg = ChunkerConfig(algo)
      Chunkers.boundaries(bytes, cfg) // warm-up
      val t0 = System.nanoTime()
      val bs = Chunkers.boundaries(bytes, cfg)
      val dt = (System.nanoTime() - t0) / 1e9
      val avg = bytes.length.toDouble / bs.length
      println(f"$algo%-17s chunks=${bs.length}%6d avgChunk=$avg%8.1f B  throughput=${bytes.length / dt / 1e6}%8.1f MB/s")
    }
    val edited = Array.fill[Byte](1024)(7) ++ bytes
    val a = Chunkers.boundaries(bytes, ChunkerConfig("fastcdc")).map(b => b.offset + b.length).toSet
    val b = Chunkers.boundaries(edited, ChunkerConfig("fastcdc")).map(x => x.offset + x.length - 1024).toSet
    println(s"fastcdc boundaries realigned after 1KB prefix insert: ${a.intersect(b).size}/${a.size}")
  }
}
