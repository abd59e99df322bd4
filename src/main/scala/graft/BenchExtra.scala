package graft

import org.apache.spark.sql.SparkSession

/** Supplementary noop-sink benchmark (optimization guide §1.4): times each
  * headline query with `df.write.format("noop")` — which computes EVERY
  * column of EVERY row — alongside the frozen driver bench's `count()`
  * action (which may let the optimizer prune columns). The driver-facing
  * [[Bench]] is FROZEN for measurement and unchanged; this main exists so
  * per-query claims can be cross-checked against a sink that cannot
  * under-count the compute. Prints ONE JSON line.
  *
  * Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... sbt "runMain graft.BenchExtra"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q1_agg")(spark, sfDir).count() // session warm-up
    SparkEntry.queries("d_exact_dedup")(spark, sfDir).count()
    val results = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        spark.sparkContext.setJobDescription(s"noop: $name")
        def sample(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val best = math.min(sample(), sample()) // best-of-2, like Bench
        spark.sparkContext.setJobDescription(null)
        name -> best
      }
    }
    val qs = results.map { case (k, s) => s""""$k":$s""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total_noop","value":$total,"unit":"sec","queries":$qs,""" +
      s""""cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
