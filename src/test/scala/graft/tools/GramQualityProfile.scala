package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall profile of d_gram_quality. Run:
  *   sbt "Test/runMain graft.tools.GramQualityProfile [sfDir]"
  *
  * CAVEAT: this is a FROZEN inline snapshot of the query's stages (from
  * the revision it was used to tune), not a decomposition of the shipped
  * `Queries.dGramQuality` — if the query's shape changes, re-derive the
  * stages here before trusting the numbers (the shipped query's values
  * stay gated by its oracle regardless).
  */
object GramQualityProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.all("q1_agg")(spark, dir).count() // warm

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    val grams = t("documents")
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"),
        col("text"))
      .select(col("doc_id"), expr("substring(text, i, 3)").as("gram"))

    time("explode-count")(grams.count())
    val model = time("model-checkpoint")(
      grams.groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true))
    println(s"[prof] model rows = ${model.count()}")
    val scal = time("scalar-head")(
      model.agg(count(lit(1)).as("d"), sum(col("cnt")).as("t")).head())
    val dd = scal.getLong(0); val tt = BigDecimal(scal.getLong(1))
    val scored = grams.join(broadcast(model), Seq("gram"))
    time("join-only-count")(scored.count())
    val rolled = scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("cnt").cast("decimal(38,0)")).as("sc"),
        sum(when(col("cnt").cast("decimal(38,0)") * lit(2L * dd)
            < lit(tt.underlying()), 1L).otherwise(0L)).as("rc"))
    time("rollup-count")(rolled.count())
    val fin = rolled.select(col("doc_id"), col("n_grams"),
      expr("cast((sc * 2000000 + n_grams) div (2 * n_grams) as bigint)")
        .as("mean_freq_micro"),
      expr("(rc * 2000000 + n_grams) div (2 * n_grams)").as("rare_ppm"))
    time("final-count")(fin.count())
    spark.stop()
  }
}
