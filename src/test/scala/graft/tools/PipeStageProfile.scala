package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{DedupConfig, DedupPipeline}

/** Where does the featurize STAGE's CPU go beyond the kernels: parquet
  * read, object encode/decode, wide-row caching?
  * Run: sbt "Test/runMain graft.tools.PipeStageProfile [nBases]"
  */
object PipeStageProfile {
  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toLong).getOrElse(20000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val path = graft.Bench.corpusPath(spark, nBases)
    def run(name: String)(f: => Unit): Unit = {
      f // warm
      val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"[prof] $name%-28s ${dt}%6.2f s wall ${dc}%7.1f s cpu")
    }
    val cfg = DedupConfig()
    def files = spark.read.parquet(path).as[graft.corpus.CorpusFile]
    run("parquet scan (len only)") {
      spark.read.parquet(path).select(sum(length($"content"))).collect()
    }
    run("scan+decode to CorpusFile") {
      files.mapPartitions(it => Iterator.single(it.map(_.content.length.toLong).sum))
        .reduce(_ + _)
    }
    run("featurize count (no cache)") {
      DedupPipeline.featurize(files, cfg).toDF()
        .select(count(lit(1))).collect()
    }
    run("featurize agg chunks (no cache)") {
      DedupPipeline.chunkTableDF(DedupPipeline.featurize(files, cfg).toDF())
        .agg(count(lit(1)), sum($"size"), countDistinct($"fp")).collect()
    }
    run("featurize persist wide + count") {
      val fdf = DedupPipeline.featurize(files, cfg).toDF().persist()
      fdf.count()
      fdf.unpersist(blocking = true)
    }
    spark.stop()
  }
}
