package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule: the same dedup-cluster
  * job on the same input at local[N] and local[4N] (sandbox stand-in for
  * N vs 4N executors). Prints one JSON line with both throughputs and
  * eff = thr(4N) / (4 · thr(N)).
  *
  * Run: sbt "runMain graft.BenchScaling [nBases] [N]"
  */
object BenchScaling {

  private def once(cores: Int, nBases: Long): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = Bench.runPipeline(spark, nBases)
    spark.stop()
    // allow a fresh context with a different master
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    res
  }

  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toLong).getOrElse(20000L)
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    // warm-up JIT at small scale so neither run pays compilation cost
    once(n, math.max(nBases / 20, 100))
    val (files1, t1) = once(n, nBases)
    val (files2, t2) = once(4 * n, nBases)
    require(files1 == files2)
    val thrN = files1 / t1
    val thr4N = files2 / t2
    val eff = thr4N / (4.0 * thrN)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.4f,"files":$files1,""" +
      f""""coresN":$n,"cores4N":${4 * n},"secN":$t1%.2f,"sec4N":$t2%.2f,""" +
      f""""filesPerSecN":$thrN%.1f,"filesPerSec4N":$thr4N%.1f}""")
  }
}
