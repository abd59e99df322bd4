package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the clone-pair element pipeline: the round-4
  * map-side hashed element stream (current `Queries.dClonePairs`) vs the
  * previous formulation (groupBy(doc_id, tok) + string-keyed df join +
  * string-carrying regroup). Same verify stage both sides. Run:
  *   sbt "Test/runMain graft.tools.ClonePairsAB [sfDir] [reps]"
  * Only interleaved comparisons are valid on this host (co-tenant noise);
  * process-CPU is the robust metric.
  */
object ClonePairsAB {

  /** The pre-round-4 formulation, verbatim shape. */
  def oldClonePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val thetaPct = 70
    val elems = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z0-9_]+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("tok"),
        explode(sequence(lit(1L), col("c"))).as("k"))
    val dfreq = elems.groupBy(col("tok"), col("k"))
      .agg(count(lit(1)).as("df"))
    val ranked = elems.join(dfreq, Seq("tok", "k"))
      .select(col("doc_id"), col("df"), col("tok"), col("k"),
        xxhash64(col("tok"), col("k")).as("h"))
    val docs = ranked.as[(Long, Long, String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (id: Long, it: Iterator[(Long, Long, String, Long, Long)]) =>
        val arr = it.map { case (_, df, tok, k, h) => (df, tok, k, h) }.toArray
        val n = arr.length
        val alpha = (n * thetaPct + 99) / 100
        val p = n - alpha + 1
        scala.util.Sorting.quickSort(arr)
        val prefix = arr.take(p).map(_._4)
        val sorted = arr.map(_._4)
        java.util.Arrays.sort(sorted)
        (id, n.toLong, sorted, prefix)
      }
      .toDF("doc_id", "n", "toks", "prefix")
      .localCheckpoint(true)
    val pre = docs.select(col("doc_id"), col("n"), explode(col("prefix")).as("h"))
    val cand = pre.toDF("a", "na", "h")
      .join(pre.toDF("b", "nb", "h"), Seq("h"))
      .filter(col("a") < col("b") &&
        least(col("na"), col("nb")) * 100 >=
          greatest(col("na"), col("nb")) * thetaPct)
      .select(col("a"), col("b"), col("na"), col("nb"))
      .distinct()
    val arrays = docs.select(col("doc_id"), col("toks"))
    cand
      .join(arrays.toDF("a", "ta"), Seq("a"))
      .join(arrays.toDF("b", "tb"), Seq("b"))
      .select(col("a"), col("b"), col("na").as("n_a"), col("nb").as("n_b"),
        graft.functions.IntersectSorted(col("ta"), col("tb")).as("inter"))
      .filter(col("inter") * 100 >=
        greatest(col("n_a"), col("n_b")) * thetaPct)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(tag: String, f: () => DataFrame): Unit = {
      val c0 = bean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = f().count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (bean.getProcessCpuTime - c0) / 1e9
      println(f"[ab] $tag rows=$n wall=$wall%.2f cpu=$cpu%.2f")
    }
    time("warmup", () => graft.Queries.all("d_clone_pairs")(spark, dir))
    (1 to reps).foreach { _ =>
      time("old", () => oldClonePairs(spark, dir))
      time("new", () => graft.Queries.all("d_clone_pairs")(spark, dir))
    }
    spark.stop()
  }
}
