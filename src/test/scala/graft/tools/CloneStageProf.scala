package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: sub-stage timing of the d_clone_pairs pipeline (r6) — the
  * stages are re-built here (they are private in Queries) with the same
  * shapes so each can be timed to a count() in isolation.
  * Run: sbt "Test/runMain graft.tools.CloneStageProf [sfDir] [reps]"
  */
object CloneStageProf {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](tag: String)(f: => T): T = {
      val c0 = bean.getProcessCpuTime
      val t0 = System.nanoTime()
      val r = f
      println(f"[clone] $tag%-14s wall=${(System.nanoTime() - t0) / 1e9}%6.2f cpu=${(bean.getProcessCpuTime - c0) / 1e9}%6.1f")
      r
    }
    graft.Queries.all("q1_agg")(spark, dir).count()
    (1 to reps).foreach { _ =>
      val elems = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).repartition(32, col("doc_id"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val sep = java.util.regex.Pattern.compile("[^a-z0-9_]+")
          it.flatMap { case (id, text) =>
            if (text == null) Iterator.empty
            else {
              val counts = scala.collection.mutable.HashMap.empty[String, Int]
              sep.split(text.toLowerCase(java.util.Locale.ROOT)).foreach { tok =>
                if (tok.nonEmpty) counts(tok) = counts.getOrElse(tok, 0) + 1
              }
              counts.iterator.flatMap { case (tok, c) =>
                val b = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                val th = org.apache.spark.sql.catalyst.expressions.XXH64
                  .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                    b.length, 42L)
                (1 to c).iterator.map { k =>
                  (id, org.apache.spark.sql.catalyst.expressions.XXH64
                    .hashLong(k.toLong, th))
                }
              }
            }
          }
        }
        .toDF("doc_id", "h")
      time("tokenize")(elems.write.format("noop").mode("overwrite").save())
      val dfreq = elems.groupBy(col("h")).agg(count(lit(1)).as("df"))
      time("dfreq")(dfreq.write.format("noop").mode("overwrite").save())
      val ranked = elems.join(dfreq, Seq("h"))
        .select(col("doc_id"), col("df"), col("h"))
      val docs = ranked.as[(Long, Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (id: Long, it: Iterator[(Long, Long, Long)]) =>
          val arr = it.map { case (_, df, h) => (df, h) }.toArray
          val n = arr.length
          val alpha = (n * 70 + 99) / 100
          val p = n - alpha + 1
          scala.util.Sorting.quickSort(arr)
          val prefix = arr.take(p).map(_._2)
          val sorted = arr.map(_._2)
          java.util.Arrays.sort(sorted)
          (id, n.toLong, sorted, prefix)
        }
        .toDF("doc_id", "n", "toks", "prefix")
      val docsC = time("docs_ckpt")(docs.localCheckpoint(true))
      val pre = docsC.select(col("doc_id"), col("n"), explode(col("prefix")).as("h"))
      val cand = pre.toDF("a", "na", "h")
        .join(pre.toDF("b", "nb", "h"), Seq("h"))
        .filter(col("a") < col("b") &&
          least(col("na"), col("nb")) * 100 >= greatest(col("na"), col("nb")) * 70)
        .select(col("a"), col("b"), col("na"), col("nb"))
        .distinct()
      val candC = time("cand")(cand.localCheckpoint(true))
      val arrays = docsC.select(col("doc_id"), col("toks"))
      val verify = candC
        .join(arrays.toDF("a", "ta"), Seq("a"))
        .join(arrays.toDF("b", "tb"), Seq("b"))
        .select(col("a"), col("b"), col("na").as("n_a"), col("nb").as("n_b"),
          graft.functions.IntersectSorted(col("ta"), col("tb")).as("inter"))
        .filter(col("inter") * 100 >= greatest(col("n_a"), col("n_b")) * 70)
      time("verify")(verify.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
