package graft

import org.apache.spark.sql.SparkSession

/** Multi-process scaling evidence: the SAME dedup-cluster job on REAL
  * separate executor JVMs via Spark's local-cluster mode — task binaries,
  * shuffle blocks and broadcasts cross process boundaries with full
  * serialization, one step closer to the executor-scale-out claim than
  * the in-process local[N] legs (BASELINE.md "Measured scaling").
  *
  * Leg A: 1 executor × 2 cores; leg B: 4 executors × 2 cores — same
  * per-executor shape, 4× the executors, so eff = thr(B) / (4 · thr(A))
  * is the executor-boundary analog of the north rule's two-cluster-size
  * criterion. Work efficiency is measured from summed per-task
  * executorCpuTime (a SparkListener), i.e. CPU actually burned inside
  * the executor processes — the contention-robust metric on this host.
  *
  * Run: SPARK_HOME=/opt/spark sbt "runMain graft.BenchMultiProc [nBases] [rounds]"
  */
object BenchMultiProc {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** One leg: warm-up + best-of-2 pipeline runs on a local-cluster of
    * `workers` executor processes × `cores` each. Returns
    * (files, bestWallSec, executorCpuSecOfBestRun).
    */
  private def once(workers: Int, cores: Int, nBases: Long,
      warm: Long): (Long, Double, Double) = {
    val spark = SparkSession.builder()
      .master(s"local-cluster[$workers,$cores,6144]")
      .config("spark.sql.shuffle.partitions", (workers * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.executor.memory", "5g")
      // executors are fresh JVMs: they need the app classes and the JDK17
      // module opens that spark-submit would normally inject
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ExecCpuMeter(spark.sparkContext)
    Bench.runPipeline(spark, warm) // JIT/codegen warm-up in every executor
    val c0 = meter.settledNs()
    val a = Bench.runPipeline(spark, nBases)
    val c1 = meter.settledNs()
    val b = Bench.runPipeline(spark, nBases)
    val c2 = meter.settledNs()
    val res = if (a._2 <= b._2) (a._1, a._2, (c1 - c0) / 1e9)
      else (b._1, b._2, (c2 - c1) / 1e9)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    res
  }

  def main(args: Array[String]): Unit = {
    // fail fast with the fix instead of 2x "Cannot find any build
    // directories" executor crashes: the release-layout SPARK_HOME has no
    // launcher/target, so the worker's command builder needs the version
    // pinned in the environment
    require(sys.env.contains("SPARK_HOME") && sys.env.contains("SPARK_SCALA_VERSION"),
      "run with SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 " +
      "(local-cluster executors are launched via the Spark distribution)")
    val nBases = args.headOption.map(_.toLong).getOrElse(10000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(2)
    val warm = math.max(nBases / 10, 1000)
    // interleaved legs + per-leg minimum, per the BASELINE.md noise rules
    val runs = (1 to rounds).map { _ => (once(1, 2, nBases, warm), once(4, 2, nBases, warm)) }
    val (files1, t1, cpu1) = runs.map(_._1).minBy(_._2)
    val (files2, t2, cpu2) = runs.map(_._2).minBy(_._2)
    require(files1 == files2)
    val thrA = files1 / t1
    val thrB = files2 / t2
    val eff = thrB / (4.0 * thrA)
    val workEff = cpu1 / cpu2
    println(
      f"""{"metric":"multiproc_scaling_efficiency","value":$eff%.4f,"files":$files1,""" +
      f""""executorsA":1,"executorsB":4,"coresPerExecutor":2,""" +
      f""""secA":$t1%.2f,"secB":$t2%.2f,""" +
      f""""filesPerSecA":$thrA%.1f,"filesPerSecB":$thrB%.1f,""" +
      f""""execCpuSecA":$cpu1%.1f,"execCpuSecB":$cpu2%.1f,"workEfficiency":$workEff%.4f}""")
  }
}
