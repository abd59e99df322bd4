package graft

import org.apache.spark.sql.SparkSession

/** One pipeline-leg measurement in a fresh JVM — the unit of the
  * cross-jar interleaved A/B (round-4 verdict item 2: decide whether the
  * BENCH_r04 `dedup_pipeline` wall move 7.64→10.45 s is engine or host,
  * given process CPU moved only +2.6%). `scripts/pipe_ab.sh` alternates
  * `spark-submit --class graft.PipeOnce` runs of the round-3 jar and the
  * HEAD jar on the same corpus; only interleaved best-of-K minima are
  * comparable on this host (BASELINE.md noise rules).
  *
  * Args: [nBases=20000] [cores=32] [reps=2] [tag=jar]. Prints one JSON
  * line with the per-rep walls/CPUs and their minima.
  */
object PipeOnce {
  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toLong).getOrElse(20000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val tag = args.lift(3).getOrElse("jar")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    Bench.runPipeline(spark, math.max(nBases / 10, 1000)) // JIT/codegen warm-up
    val samples = (0 until reps).map { _ =>
      val c0 = bean.getProcessCpuTime
      val (files, wall) = Bench.runPipeline(spark, nBases)
      (files, wall, (bean.getProcessCpuTime - c0) / 1e9)
    }
    val walls = samples.map(_._2)
    val cpus = samples.map(_._3)
    println(
      f"""{"tag":"$tag","files":${samples.head._1},"wall":${walls.min}%.3f,""" +
      f""""cpu":${cpus.min}%.2f,"walls":[${walls.map(w => f"$w%.3f").mkString(",")}],""" +
      f""""cpus":[${cpus.map(c => f"$c%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
