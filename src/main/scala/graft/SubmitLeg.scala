package graft

import org.apache.spark.sql.SparkSession

/** One `spark-submit` scaling leg — the literal reading of the north
  * rule's "run via spark-submit on a multi-executor cluster at two
  * cluster sizes". The master and executor topology come from the
  * spark-submit command line (`scripts/submit_scaling.sh` launches
  * `local-cluster[1,2,…]` then `local-cluster[4,2,…]` — real separate
  * executor JVMs started by the Spark distribution, app classes shipped
  * as the packaged jar); this main only runs the dedup-cluster pipeline
  * (JIT warm-up leg, then best-of-2) and prints ONE JSON line
  * `{files, sec, execCpuSec, master}` for the script to aggregate into
  * scaling efficiency. Interleaving, best-of-K, and the work-efficiency
  * computation live in the script, per the BASELINE.md noise rules.
  */
object SubmitLeg {
  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toLong).getOrElse(10000L)
    val warm = math.max(nBases / 10, 1000L)
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate() // master + partitions + memory all from spark-submit
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ExecCpuMeter(spark.sparkContext)
    Bench.runPipeline(spark, warm) // JIT/codegen warm-up in every executor
    val c0 = meter.settledNs()
    val a = Bench.runPipeline(spark, nBases)
    val c1 = meter.settledNs()
    val b = Bench.runPipeline(spark, nBases)
    val c2 = meter.settledNs()
    val (files, sec, cpu) =
      if (a._2 <= b._2) (a._1, a._2, (c1 - c0) / 1e9)
      else (b._1, b._2, (c2 - c1) / 1e9)
    println(
      f"""{"metric":"submit_leg","files":$files,"sec":$sec%.3f,""" +
      f""""execCpuSec":$cpu%.2f,"master":"${spark.sparkContext.master}"}""")
    spark.stop()
  }
}
