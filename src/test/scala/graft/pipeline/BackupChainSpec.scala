package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.corpus.CorpusGen

/** Incremental multi-backup chaining ([[ClusterJob.backup]]): successive
  * corpus snapshots against a shared container store, HAR's sparse list
  * handed from root to root like the reference's inter-job monitor state
  * (src/har_rewrite.c:59-117) — plus the resume-by-skip contract per
  * root.
  *
  * Three overlapping snapshot windows give the HAR cadence its first
  * possible firing: backup-1 containers are fully utilized by
  * construction, sparsity is first OBSERVED by backup 2's recipe and
  * first REWRITTEN during backup 3.
  */
class BackupChainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_chain_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // three overlapping snapshot windows over a sorted file list — each
  // backup shares ~2/3 of its files with the previous one
  private lazy val slices: Seq[Seq[graft.corpus.CorpusFile]] = {
    val all = CorpusGen.generateLocal(nBases = 60).map(_._1)
      .sortBy(f => (f.repo, f.path, f.commit))
    val n = all.size
    Seq(
      all.slice(0, (n * 6) / 10),
      all.slice((n * 2) / 10, (n * 8) / 10),
      all.slice((n * 4) / 10, n))
  }

  private def corpusOf(i: Int) = spark.createDataset(slices(i))(
    org.apache.spark.sql.Encoders.product[graft.corpus.CorpusFile])

  private val settings = DestorConfig.parse(
    """chunk-algorithm fastcdc
      |rewrite-enable-har yes
      |rewrite-har-utilization-threshold 0.5
      |rewrite-har-rewrite-limit 0.5
      |restore-cache lru 8
      |simulation-level restore""".stripMargin)

  // small payload so each backup writes many containers and partial
  // utilization is visible at this corpus size
  private val Payload = 4096L

  test("three chained backups: cross-run dedup, continued container ids, HAR firing at backup 3") {
    val (r1, r2, r3) = (freshDir(), freshDir(), freshDir())
    val b1 = ClusterJob.backup(corpusOf(0), r1, "j1", settings, None, Payload)
    assert(b1.backup_id === 1L)
    assert(b1.chunks > 0 && b1.unique_chunks > 0 && b1.containers_written > 0)
    assert(b1.rewritten_chunks === 0L) // no inherited sparse list yet
    assert(b1.container_reads > 0 && b1.speed_factor > 0)
    for (t <- Seq("chunks", "final_recipe", "index", "har_sparse",
        "restore_sim"))
      assert(TableIO.committed(s"$r1/$t"), t)

    val b2 = ClusterJob.backup(corpusOf(1), r2, "j2", settings, Some(r1),
      Payload)
    assert(b2.backup_id === 2L)
    // cross-run dedup: shared files' chunks hit backup 1's index
    assert(b2.unique_chunks < b2.chunks)
    assert(b2.unique_size < b2.data_size)
    // container ids continue past backup 1's store
    val idx1Max = spark.read.parquet(s"$r1/index")
      .agg(max($"idxCid")).as[Long].head()
    val b2MinWritten = spark.read.parquet(s"$r2/final_recipe")
      .filter($"write").agg(min($"containerId")).as[Long].head()
    assert(b2MinWritten === idx1Max + 1)
    // the cumulative index grows and stays latest-wins unique per fp
    val idx2 = spark.read.parquet(s"$r2/index")
    assert(idx2.count() > spark.read.parquet(s"$r1/index").count())
    assert(idx2.count() === idx2.select($"fp").distinct().count())
    // backup 2 OBSERVES sparsity (partial reuse of backup 1's containers)
    assert(b2.sparse_containers > 0)

    val b3 = ClusterJob.backup(corpusOf(2), r3, "j3", settings, Some(r2),
      Payload)
    assert(b3.backup_id === 3L)
    // backup 3 inherits backup 2's sparse list and REWRITES against it
    assert(b3.rewritten_chunks > 0)
    assert(b3.stored_size === b3.unique_size + b3.rewritten_size)
    // every recipe row resolved to a real container
    assert(spark.read.parquet(s"$r3/final_recipe")
      .filter($"containerId".isNull || $"containerId" < 0).count() === 0L)

    // resume-by-skip: identical stats, no stage recompute, no duplicate
    // backup metrics
    val b3b = ClusterJob.backup(corpusOf(2), r3, "j3-resume", settings,
      Some(r2), Payload)
    assert(b3b === b3)
    assert(spark.read.parquet(s"$r3/final_recipe")
      .select($"_lineage.runId").distinct().as[String].collect().toSeq
      === Seq("j3"))
    assert(spark.read.parquet(s"$r3/metrics")
      .filter($"stage" === "backup" && $"metric" === "backup_id")
      .count() === 1)
  }

  test("expire the oldest backup: chain compacts and stays usable for a 4th backup") {
    val (r1, r2, r3, e1, r4) =
      (freshDir(), freshDir(), freshDir(), freshDir(), freshDir())
    ClusterJob.backup(corpusOf(0), r1, "j1", settings, None, Payload)
    ClusterJob.backup(corpusOf(1), r2, "j2", settings, Some(r1), Payload)
    ClusterJob.backup(corpusOf(2), r3, "j3", settings, Some(r2), Payload)

    val ex = ClusterJob.expire(spark, Seq(r1, r2, r3), r1, e1, "gc1", Payload)
    assert(ex.expiredVersion === "b1")
    // b1's rows are gone; the survivors' recipes shrink accordingly
    assert(ex.rowsAfter < ex.rowsBefore)
    assert(ex.rowsAfter === spark.read.parquet(s"$e1/recipes").count())
    // something actually migrated at this overlap (b1 wrote the shared
    // base copies; b2/b3 keep many of them alive in compacted containers)
    assert(ex.migratedChunks > 0 && ex.migratedBytes > 0)
    assert(ex.containersAfter < ex.containersBefore)
    // compacted containers never reappear in the surviving chain
    val oldCids = spark.read.parquet(s"$e1/migration")
      .select($"old_cid").distinct().as[Long].collect().toSet
    val refCids = spark.read.parquet(s"$e1/recipes")
      .select($"containerId").distinct().as[Long].collect().toSet
    assert(oldCids.intersect(refCids).isEmpty)
    // the handed-off index is latest-wins unique and covers exactly the
    // surviving fps
    val idx = spark.read.parquet(s"$e1/index")
    assert(idx.count() === ex.indexFps)
    assert(idx.count() === idx.select($"fp").distinct().count())
    assert(idx.join(spark.read.parquet(s"$e1/recipes")
      .select($"fp").distinct(), Seq("fp"), "left_anti").count() === 0L)

    // the chain continues FROM the compacted root: backup 4 re-ingests
    // backup 3's corpus and should dedup nearly everything against the
    // post-compaction index
    val b4 = ClusterJob.backup(corpusOf(2), r4, "j4", settings, Some(e1),
      Payload)
    assert(b4.backup_id === 4L)
    assert(b4.unique_chunks < b4.chunks / 10)
    // written containers continue past the compacted store's high water
    val idxMax = idx.agg(max($"idxCid")).as[Long].head()
    val b4Written = spark.read.parquet(s"$r4/final_recipe")
      .filter($"write")
    if (b4Written.count() > 0)
      assert(b4Written.agg(min($"containerId")).as[Long].head() === idxMax + 1)
    // and b4 never references a compacted container
    assert(spark.read.parquet(s"$r4/final_recipe")
      .filter($"containerId".isin(oldCids.toSeq: _*)).count() === 0L)

    // resume-by-skip: identical stats, nothing recomputed
    val ex2 = ClusterJob.expire(spark, Seq(r1, r2, r3), r1, e1, "gc1-resume",
      Payload)
    assert(ex2 === ex)
    assert(spark.read.parquet(s"$e1/recipes")
      .select($"_lineage.runId").distinct().as[String].collect().toSeq
      === Seq("gc1"))
  }

  test("retention composes: a second expiry by label over a chain containing the compacted root") {
    val (r1, r2, r3, e1, r4, e2, r5) = (freshDir(), freshDir(), freshDir(),
      freshDir(), freshDir(), freshDir(), freshDir())
    ClusterJob.backup(corpusOf(0), r1, "j1", settings, None, Payload)
    ClusterJob.backup(corpusOf(1), r2, "j2", settings, Some(r1), Payload)
    ClusterJob.backup(corpusOf(2), r3, "j3", settings, Some(r2), Payload)
    ClusterJob.expire(spark, Seq(r1, r2, r3), r1, e1, "gc1", Payload)
    val b4 = ClusterJob.backup(corpusOf(0), r4, "j4", settings, Some(e1),
      Payload)
    assert(b4.backup_id === 4L)

    // a compacted root carries several labels — selecting by root must
    // refuse loudly instead of expiring the wrong backup
    intercept[IllegalArgumentException] {
      ClusterJob.expire(spark, Seq(e1, r4), e1, freshDir(), "gc-bad", Payload)
    }
    // and an unknown label refuses too
    intercept[IllegalArgumentException] {
      ClusterJob.expire(spark, Seq(e1, r4), "b9", freshDir(), "gc-bad2",
        Payload)
    }

    // the second retention pass selects by stream label over the
    // compacted root + the chained 4th backup
    val ex2 = ClusterJob.expire(spark, Seq(e1, r4), "b2", e2, "gc2", Payload)
    assert(ex2.expiredVersion === "b2")
    assert(ex2.rowsAfter < ex2.rowsBefore)
    val labels = spark.read.parquet(s"$e2/recipes")
      .select($"stream").distinct().as[String].collect().toSet
    assert(labels === Set("b3", "b4"))
    // containers compacted in THIS pass never reappear in the survivors
    val oldCids2 = spark.read.parquet(s"$e2/migration")
      .select($"old_cid").distinct().as[Long].collect().toSet
    val refCids2 = spark.read.parquet(s"$e2/recipes")
      .select($"containerId").distinct().as[Long].collect().toSet
    assert(oldCids2.intersect(refCids2).isEmpty)

    // the twice-compacted root still chains: backup 5 numbers itself from
    // the surviving labels (b3, b4 → b5) and dedups against its index
    val b5 = ClusterJob.backup(corpusOf(2), r5, "j5", settings, Some(e2),
      Payload)
    assert(b5.backup_id === 5L)
    assert(b5.unique_chunks < b5.chunks / 10) // b3's corpus is all alive
  }

  private def deleteRec(p: java.io.File): Unit = {
    if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(deleteRec))
    p.delete()
  }

  test("chain id derivation survives a lost metrics table; an empty snapshot is a valid no-op backup") {
    val (r1, r2, r3, r4) = (freshDir(), freshDir(), freshDir(), freshDir())
    ClusterJob.backup(corpusOf(0), r1, "j1", settings, None, Payload)
    // simulate the documented crash window: the metrics table is gone but
    // the recipe stage is committed — the next id comes from the labels
    deleteRec(new java.io.File(s"$r1/metrics"))
    val b2 = ClusterJob.backup(corpusOf(1), r2, "j2", settings, Some(r1),
      Payload)
    assert(b2.backup_id === 2L)

    // an empty snapshot: zero stats, store state carried unchanged
    val empty = spark.createDataset(Seq.empty[graft.corpus.CorpusFile])(
      org.apache.spark.sql.Encoders.product[graft.corpus.CorpusFile])
    val b3 = ClusterJob.backup(empty, r3, "j3", settings, Some(r2), Payload)
    assert(b3.backup_id === 3L)
    assert(b3.files === 0L && b3.chunks === 0L && b3.unique_chunks === 0L)
    assert(b3.containers_written === 0L && b3.stored_size === 0L)
    assert(spark.read.parquet(s"$r3/index").count()
      === spark.read.parquet(s"$r2/index").count())
    // resuming the empty backup returns identical zero stats
    assert(ClusterJob.backup(empty, r3, "j3-resume", settings, Some(r2),
      Payload) === b3)

    // chaining past the empty backup: its recipe has no labels, so the
    // id falls back to the committed metrics row
    val b4 = ClusterJob.backup(corpusOf(1), r4, "j4", settings, Some(r3),
      Payload)
    assert(b4.backup_id === 4L)
    assert(b4.unique_chunks < b4.chunks / 10) // b2's corpus, carried index
  }
}
