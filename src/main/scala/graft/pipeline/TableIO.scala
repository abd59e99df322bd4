package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thin checkpointed stage-table layer.
  *
  * Reproduces the Iceberg semantics the pipeline needs in this sandbox —
  * atomic snapshot commit (parquet `_SUCCESS` marker written last by the
  * commit protocol) and resume-by-skip — behind one entry point, so a
  * real Iceberg catalog drops in unchanged (SURVEY.md §7.3: no Iceberg
  * runtime jar ships in /opt/spark/jars and the sandbox is zero-egress).
  *
  * Every stage table carries per-partition lineage: the stage name, the
  * writing task's partition id, and the run id that produced it.
  */
object TableIO {

  final val Format = "parquet" // swap for "iceberg" with a catalog

  def committed(path: String): Boolean =
    new java.io.File(s"$path/_SUCCESS").exists()

  /** Compute-or-load a stage table. On resume, a committed stage is read
    * back and its compute is never invoked.
    */
  def stage(spark: SparkSession, root: String, name: String, runId: String)(
      compute: => DataFrame): DataFrame = {
    val path = s"$root/$name"
    if (!committed(path)) {
      compute
        .withColumn("_lineage",
          struct(lit(name).as("stage"), spark_partition_id().as("part"),
            lit(runId).as("runId")))
        .write.mode("overwrite").format(Format).save(path)
    }
    spark.read.format(Format).load(path)
  }

  /** Append metrics rows (the run log — reference backup.log/destor.stat,
    * src/do_backup.c:155-186, src/destor.c:134-213).
    */
  def appendMetrics(spark: SparkSession, root: String, runId: String,
      stage: String, kv: Seq[(String, Double)]): Unit = {
    import spark.implicits._
    kv.toDF("metric", "value")
      .withColumn("runId", lit(runId))
      .withColumn("stage", lit(stage))
      .withColumn("ts", current_timestamp())
      .write.mode("append").format(Format).save(s"$root/metrics")
  }
}
