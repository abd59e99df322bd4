package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual driver queries best-of-K with a warm-up pass — the only
  * valid way to compare on this noisy host (see BASELINE.md noise rules).
  * Run: sbt "Test/runMain graft.tools.QueryBench <sfDir> <reps> <name>..."
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("e_ann_topk", "e_lsh_dedup", "e_ivf_topk", "e_cosine_dedup")
    // same SPARK_GRAFT_CPUS convention as graft.Bench so numbers compare
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q1_agg")(spark, sfDir).count() // session warm-up
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $name%-24s best ${times.min}%7.3f s  all ${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
