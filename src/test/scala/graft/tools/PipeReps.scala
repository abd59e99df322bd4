package graft.tools
import org.apache.spark.sql.SparkSession
object PipeReps {
  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toLong).getOrElse(20000L)
    val cores = args.lift(1).getOrElse("32")
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    (1 to reps).foreach { i =>
      val c0 = bean.getProcessCpuTime
      val g0 = gcMs()
      val (nf, sec) = graft.Bench.runPipeline(spark, nBases)
      val cpu = (bean.getProcessCpuTime - c0) / 1e9
      println(f"[pipe] rep$i files=$nf wall=$sec%.2f cpu=$cpu%.1f gcSec=${(gcMs() - g0) / 1e3}%.1f")
    }
    spark.stop()
  }
}
