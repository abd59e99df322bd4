package graft.tools

import graft.pipeline.{DedupConfig, Shingles}
import graft.chunking.Chunkers

/** Single-thread featurize kernel profile: where does a featurize CPU
  * second actually go (chunk+SHA-1, sha256, shingles, minhash, simhash)?
  * Run: sbt "Test/runMain graft.tools.FeatProfile [nBases]"
  */
object FeatProfile {
  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toInt).getOrElse(2000)
    val files = graft.corpus.CorpusGen.generateLocal(nBases = nBases).map(_._1)
    val bytes = files.map(_.content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val total = bytes.map(_.length.toLong).sum
    val cfg = DedupConfig()
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    val sha256 = java.security.MessageDigest.getInstance("SHA-256")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[feat] $name%-12s ${dt}%6.2f s  ${total / dt / 1e6}%7.1f MB/s")
    }
    time("chunk+sha1") {
      val cut = Chunkers.forConfig(cfg.chunker)
      bytes.foreach { b =>
        Chunkers.boundaries(b, cut).foreach { bd =>
          sha1.reset(); sha1.update(b, bd.offset, bd.length); sha1.digest()
        }
      }
    }
    time("sha256") {
      bytes.foreach { b => sha256.reset(); sha256.digest(b) }
    }
    var shingleSets: Seq[Array[Long]] = null
    time("shingles") {
      shingleSets = bytes.map(b => Shingles.shingleHashes(b, cfg.shingle))
    }
    val nSh = shingleSets.map(_.length.toLong).sum
    time("minhash128") {
      shingleSets.foreach(s => Shingles.minhash(s, cfg.shingle.minhashK))
    }
    time("simhash") {
      shingleSets.foreach(Shingles.simhash)
    }
    println(f"[feat] files=${files.size} bytes=$total shingles=$nSh (avg ${total / math.max(nSh, 1)} B)")
  }
}
