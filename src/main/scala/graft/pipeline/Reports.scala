package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The metrics contract (reference: per-job counters and the stats block,
  * src/jcr.h:19-61, src/do_backup.c:75-131, src/destor.c:215-261):
  * dedup ratio, zero chunks, rewrite ratio, container counts — emitted as
  * one-row DataFrames appended to the run's `metrics` table.
  */
object Reports {

  /** A8 dedup-ratio stats over the chunk table (one pass; dup column
    * optional — if absent, uniqueness is derived from distinct fps).
    */
  def dedupStats(chunks: Dataset[ChunkRow]): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val agg1 = chunks.groupBy($"fp")
      .agg(count(lit(1)).as("copies"), first($"size").as("size"),
        max(when($"zero", 1L).otherwise(0L)).as("isZero"))
    agg1.agg(
      sum($"copies").as("total_chunks"),
      count(lit(1)).as("unique_chunks"),
      sum($"copies" * $"size").as("total_bytes"),
      sum($"size").as("unique_bytes"),
      sum(when($"isZero" === 1, $"copies").otherwise(0L)).as("zero_chunks"))
      .withColumn("dedup_ratio",
        round($"total_bytes" / $"unique_bytes", 4))
      .withColumn("storage_saving",
        round(lit(1.0) - $"unique_bytes" / $"total_bytes", 4))
  }

  /** Rewrite ratio (reference: src/do_backup.c:99-100): rewritten bytes /
    * total duplicate bytes, over a marked recipe with `write` (P14) and
    * `dup` columns.
    */
  def rewriteStats(marked: DataFrame): DataFrame = {
    marked.agg(
      sum(when(col("dup") && col("write"), col("size")).otherwise(0L))
        .as("rewritten_bytes"),
      sum(when(col("dup"), col("size")).otherwise(0L)).as("dup_bytes"),
      sum(col("size")).as("total_bytes"))
      .withColumn("rewrite_ratio",
        round(col("rewritten_bytes") / col("total_bytes"), 6))
  }

  /** One metrics row per run for the checkpointed metrics table. */
  def runMetrics(runId: String, stage: String, kv: Map[String, Double])(
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    kv.toSeq.toDF("metric", "value")
      .withColumn("runId", lit(runId))
      .withColumn("stage", lit(stage))
  }
}
