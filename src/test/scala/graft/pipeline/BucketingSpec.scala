package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Co-located joins via bucketing: at 100 TB the fp-keyed joins
  * (recipe ⋈ containers, chunks ⋈ index) should be bucket-pruned, not
  * shuffled. This spec proves the engine's tables support it: two tables
  * bucketed by fp join with ZERO Exchange operators in the plan, and
  * results match the shuffled join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fp-bucketed tables join without any shuffle exchange") {
    val corpus = spark.createDataset(
      graft.corpus.CorpusGen.generateLocal(nBases = 40).map(_._1))(
      org.apache.spark.sql.Encoders.product[graft.corpus.CorpusFile])
    val chunks = DedupPipeline.chunkTable(
      DedupPipeline.featurize(corpus, DedupConfig())).toDF()

    spark.sql("DROP TABLE IF EXISTS chunks_bkt")
    spark.sql("DROP TABLE IF EXISTS index_bkt")
    // a previous JVM's managed-table directories survive the in-memory
    // catalog; remove them or CREATE TABLE AS refuses the location
    for (t <- Seq("chunks_bkt", "index_bkt")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists())
        new scala.reflect.io.Directory(dir).deleteRecursively()
    }
    chunks.write.bucketBy(8, "fp").sortBy("fp")
      .mode("overwrite").saveAsTable("chunks_bkt")
    chunks.groupBy($"fp").agg(min($"size").as("size"))
      .write.bucketBy(8, "fp").sortBy("fp")
      .mode("overwrite").saveAsTable("index_bkt")

    // force the non-broadcast path: the point is that a big-big fp join
    // needs NO shuffle when both sides are bucketed by fp
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("chunks_bkt")
        .join(spark.table("index_bkt").select($"fp", $"size".as("idxSize")), Seq("fp"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")

      // same result as the shuffled join
      val shuffled = chunks
        .join(chunks.groupBy($"fp").agg(min($"size").as("idxSize")), Seq("fp"))
      assert(joined.count() === shuffled.count())
      assert(joined.agg(sum($"idxSize")).as[Long].head() ===
        shuffled.agg(sum($"idxSize")).as[Long].head())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
