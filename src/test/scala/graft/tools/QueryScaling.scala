package graft.tools

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence for ONE driver query — the per-query
  * analog of graft.BenchScaling (same noise methodology: interleaved
  * rounds so co-tenant load hits both levels alike, best-of-K per level,
  * process-CPU work efficiency as the contention-robust metric; see
  * BASELINE.md noise rules).
  * Run: sbt "Test/runMain graft.tools.QueryScaling <name> [sfDir] [c1] [c2] [rounds]"
  */
object QueryScaling {

  private def processCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getProcessCpuTime / 1e9

  /** Fresh session at `cores`: JIT/codegen warm-up on the small dir, then
    * the query twice on `sfDir`; returns (best wall, cpu of best run).
    */
  private def once(name: String, sfDir: String, warmDir: String,
      cores: Int): (Double, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, warmDir).count()
    def run(): (Double, Double) = {
      val c0 = processCpuSec(); val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, processCpuSec() - c0)
    }
    val a = run(); val b = run()
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    if (a._1 <= b._1) a else b
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val c1 = args.lift(2).map(_.toInt).getOrElse(2)
    val c2 = args.lift(3).map(_.toInt).getOrElse(8)
    val rounds = args.lift(4).map(_.toInt).getOrElse(3)
    val warmDir = "/root/testdata/sf0.01"
    var r1 = List.empty[(Double, Double)]
    var r2 = List.empty[(Double, Double)]
    for (r <- 1 to rounds) {
      val a = once(name, sfDir, warmDir, c1)
      val b = once(name, sfDir, warmDir, c2)
      println(f"[qscale] round $r: local[$c1] wall=${a._1}%.2f cpu=${a._2}%.1f | local[$c2] wall=${b._1}%.2f cpu=${b._2}%.1f")
      r1 ::= a; r2 ::= b
    }
    val (w1, cpu1) = (r1.map(_._1).min, r1.map(_._2).min)
    val (w2, cpu2) = (r2.map(_._1).min, r2.map(_._2).min)
    val speedup = w1 / w2
    val wallEff = speedup / (c2.toDouble / c1)
    val workEff = cpu1 / cpu2
    println(f"[qscale] $name best: local[$c1] $w1%.2f s (cpu $cpu1%.1f) -> local[$c2] $w2%.2f s (cpu $cpu2%.1f)")
    println(f"[qscale] $name speedup x$speedup%.2f at x${c2 / c1} cores | wall-clock eff $wallEff%.2f | workEff $workEff%.2f")
  }
}
