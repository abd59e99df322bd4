package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline._

/** Stage-by-stage timing of the dedup pipeline on a synthetic corpus.
  * Run: sbt "Test/runMain graft.tools.DrivePipeline [nBases] [cores]"
  */
object DrivePipeline {
  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toLong).getOrElse(20000L)
    val cores = args.lift(1).getOrElse("8")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = DedupConfig()
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val c0 = os.getProcessCpuTime
      val r = f
      println(f"[stage] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ${(os.getProcessCpuTime - c0) / 1e9}%7.1f s cpu")
      r
    }

    val files = CorpusGen.generate(spark, nBases)
    val allFeatures = DedupPipeline.featurize(files, cfg)
    val features = time("featurize") {
      val x = DedupPipeline.sigs(allFeatures).persist(); x.count(); x
    }
    val nFiles = features.count()
    val bytes = allFeatures.agg(org.apache.spark.sql.functions.sum($"size")).as[Long].head()
    println(s"[stage] files=$nFiles bytes=$bytes")
    val cand = time("lsh_candidates") {
      val x = DedupPipeline.candidatePairs(features, cfg).persist(); x.count(); x
    }
    println(s"[stage] candidates=${cand.count()}")
    val verified = time("verify") {
      val x = DedupPipeline.verifiedPairs(cand, features, cfg).persist(); x.count(); x
    }
    println(s"[stage] verified=${verified.count()}")
    val exact = time("exact_edges") {
      val x = DedupPipeline.exactContentEdges(features).persist(); x.count(); x
    }
    val clusters = time("connected_comp") {
      val edges = verified.select($"a", $"b").union(exact)
      val x = ConnectedComponents.run(features.select($"fileId"), edges, cfg.ccMaxIter)
      x.count(); x
    }
    val t0 = System.nanoTime()
    val (nf, sec) = graft.Bench.runPipeline(spark, nBases)
    println(f"[stage] end-to-end (fresh) $sec%.2f s  ${nf / sec}%.0f files/s")
    spark.stop()
  }
}
