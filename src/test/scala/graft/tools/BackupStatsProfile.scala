package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for d_backup_stats at sf0.1 — which barrier costs what.
  * Run: sbt "Test/runMain graft.tools.BackupStatsProfile [sfDir]"
  */
object BackupStatsProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Queries.all("q1_agg")(spark, dir).count() // session warm-up
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(e.jobId) = e.time
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { t0 =>
          println(f"[job] id=${e.jobId}%3d ${(e.time - t0) / 1e3}%7.2f s")
        }
    })
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bsp] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($r)")
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      time("full d_backup_stats") {
        graft.Queries.all("d_backup_stats")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
