package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.all("q1_agg")(spark, dir).count() // warm
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (1 to reps).foreach { i =>
      val c0 = bean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = graft.Queries.all(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (bean.getProcessCpuTime - c0) / 1e9
      println(f"[timeq] $name rep$i rows=$n wall=$wall%.2f cpu=$cpu%.2f")
    }
    spark.stop()
  }
}
