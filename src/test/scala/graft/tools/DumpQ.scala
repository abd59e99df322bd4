package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: dump ONE query's result parquet + its oracle SQL for a
  * targeted DuckDB comparison (the Verify flow for a single name).
  * Usage: DumpQ <name> [sfDir] [outDir]
  */
object DumpQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(2).getOrElse("/tmp/dumpq")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.all(name)(spark, dir)
    df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    graft.Queries.oracle.get(name).foreach { sql =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/$name.sql"),
        sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(s"[dumpq] $name rows=${spark.read.parquet(s"$out/$name.parquet").count()} -> $out")
    spark.stop()
  }
}
