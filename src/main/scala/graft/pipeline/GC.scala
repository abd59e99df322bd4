package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Garbage collection after version deletion (reference: src/do_delete.c,
  * src/cma.c) — the compaction job of SURVEY.md §3.3.
  *
  * Model: `recipe` rows carry a `version` column (the backup/commit that
  * referenced the chunk). Deleting a version makes its fps dead unless a
  * surviving version still references them (J6 left_anti); containers
  * holding dead chunks compact by migrating survivors; the CMA manifest
  * (container → last-referencing version) reclaims containers whose last
  * reference is at or before the deleted version (J8).
  */
object GC {

  /** J6: chunks of `deletedVersion` that no surviving version references. */
  def deadChunks(recipe: DataFrame, deletedVersion: String): DataFrame = {
    val dead = recipe.filter(col("version") === deletedVersion)
      .select(col("fp"), col("containerId"), col("size")).distinct()
    val live = recipe.filter(col("version") =!= deletedVersion)
      .select(col("fp")).distinct()
    dead.join(live, Seq("fp"), "left_anti")
  }

  /** Containers affected by the deletion, with surviving vs dead bytes —
    * the migration work list (reference: src/do_delete.c:130-265).
    */
  def compactionPlan(recipe: DataFrame, deletedVersion: String): DataFrame = {
    // distinct fps only: a dup here would multiply chunk rows in the join
    val dead = deadChunks(recipe, deletedVersion)
      .select(col("fp").as("deadFp")).distinct()
    val perContainer = recipe
      .select(col("fp"), col("containerId"), col("size")).distinct()
      .join(dead.select(col("deadFp"), lit(true).as("isDead")),
        col("fp") === col("deadFp"), "left")
      .groupBy(col("containerId"))
      .agg(
        sum(when(col("isDead"), 0L).otherwise(col("size"))).as("surviving_bytes"),
        sum(when(col("isDead"), col("size")).otherwise(0L)).as("dead_bytes"),
        sum(when(col("isDead"), 1L).otherwise(0L)).as("dead_chunks"))
    perContainer.filter(col("dead_chunks") > 0)
  }

  /** J8 CMA manifest merge: container → last-referencing version,
    * full-outer-merged with this run's usage
    * (reference: src/cma.c:17-75).
    */
  def mergeManifest(manifest: DataFrame, runUsage: DataFrame): DataFrame = {
    manifest.select(col("containerId"), col("lastRef").as("oldRef"))
      .join(runUsage.select(col("containerId"), col("lastRef").as("newRef")),
        Seq("containerId"), "full_outer")
      .select(col("containerId"),
        greatest(coalesce(col("oldRef"), lit("")),
          coalesce(col("newRef"), lit(""))).as("lastRef"))
  }

  /** J8 truncation: containers reclaimable because their last reference
    * is ≤ the deleted version (reference: src/cma.c:83-139).
    */
  def reclaimable(manifest: DataFrame, deletedVersion: String): DataFrame =
    manifest.filter(col("lastRef") <= deletedVersion)
}
