package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profile of d_ngram_jaccard_pairs. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) >= 8)
    val grams = d
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 7)).as("i"))
      .select(col("doc_id"), xxhash64(expr("substring(text, i, 8)")).as("g"))
      .distinct()
    time("grams distinct count")(println(grams.count()))
    val gramDf = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val rare = grams.join(gramDf.filter(col("df") <= 32).select(col("g")), Seq("g"))
    time("rare count")(println(rare.count()))
    val rcp = time("rare checkpoint")(rare.localCheckpoint(true))
    val sizes = rcp.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    time("sizes count")(println(sizes.count()))
    val lists = rcp.groupBy(col("g")).agg(collect_list(col("doc_id")).as("ds"))
    time("lists count")(println(lists.count()))
    val pairs = lists.select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y ->
          |    named_struct('a', least(x, y), 'b', greatest(x, y)))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    time("pairs explode count")(println(pairs.count()))
    val inter = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    time("inter count")(println(inter.count()))
    val out = inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), Seq("a"))
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), Seq("b"))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= 0.05)
    time("final count")(println(out.count()))
    spark.stop()
  }
}
