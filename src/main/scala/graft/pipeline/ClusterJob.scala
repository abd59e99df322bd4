package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.CorpusFile

/** The spark-submit job of the north rule: corpus table in → checkpointed
  * stage tables out (signatures, chunks, containers, recipe, pairs,
  * clusters, metrics), resumable mid-run — re-submitting with the same
  * checkpoint root skips every committed stage (SURVEY.md §7.1).
  */
object ClusterJob {

  final case class Summary(
      files: Long, chunks: Long, uniqueChunks: Long,
      totalBytes: Long, uniqueBytes: Long,
      candidatePairs: Long, verifiedPairs: Long, clusters: Long)

  /** Compute-or-load a stage table WITH the per-phase wall + process-CPU
    * metrics rows (reference: the per-phase throughput block of
    * backup.log, src/do_backup.c:112-131). Only a FRESHLY COMPUTED stage
    * appends its rows — a resumed (read-back) stage must not pollute the
    * run log with near-zero phantom phases. Known (accepted) window: a
    * crash BETWEEN a stage's _SUCCESS commit and its metrics append loses
    * that stage's throughput rows — the resume never recomputes, so the
    * timing is genuinely gone; metrics are a run log, not part of the
    * resumability contract.
    */
  private def instrumentedStage(spark: SparkSession, root: String,
      name: String, runId: String)(f: => DataFrame): DataFrame = {
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val fresh = !TableIO.committed(s"$root/$name")
    val c0 = osBean.getProcessCpuTime
    val t0 = System.nanoTime()
    val df = TableIO.stage(spark, root, name, runId)(f)
    if (fresh)
      TableIO.appendMetrics(spark, root, runId, name, Seq(
        "wall_sec" -> (System.nanoTime() - t0) / 1e9,
        "cpu_sec" -> (osBean.getProcessCpuTime - c0) / 1e9))
    df
  }

  def run(corpus: Dataset[CorpusFile], root: String, runId: String,
      cfg: DedupConfig = DedupConfig()): Summary = {
    val spark = corpus.sparkSession
    import spark.implicits._

    def stage(name: String)(f: => DataFrame): DataFrame =
      instrumentedStage(spark, root, name, runId)(f)

    // 1. featurize → signatures + chunk tables (content dropped here)
    lazy val featurized = DedupPipeline.featurize(corpus, cfg).toDF().persist()
    val signatures = stage("signatures") {
      featurized.select($"fileId", $"repo", $"path", $"commit", $"lang",
        $"size", $"sha256", $"shingles", $"minhash", $"simhash")
    }
    val chunks = stage("chunks")(DedupPipeline.chunkTableDF(featurized))

    // 2. exact dedup + container packing
    val unique = stage("unique_chunks") {
      DedupPipeline.uniqueChunks(chunks.drop("_lineage").as[ChunkRow]).toDF()
    }
    val packed = stage("containers") {
      DedupPipeline.packContainers(
        unique.drop("_lineage").as[UniqueChunk], cfg).toDF()
    }

    // 3. recipe with duplicate marking + container ids
    val recipe = stage("recipe") {
      DedupPipeline.recipe(
        chunks.drop("_lineage").as[ChunkRow],
        packed.drop("_lineage").as[PackedChunk])
    }

    // 4-6. near-dup candidates → verified pairs → clusters
    val sigsDs = signatures
      .select($"fileId", $"sha256", $"shingles", $"minhash").as[FileSig]
      .persist()
    val candidates = stage("candidate_pairs") {
      DedupPipeline.candidatePairs(sigsDs, cfg)
    }
    val verified = stage("verified_pairs") {
      DedupPipeline.verifiedPairs(candidates.drop("_lineage"), sigsDs, cfg)
    }
    val clusters = stage("clusters") {
      val edges = verified.select($"a", $"b")
        .union(DedupPipeline.exactContentEdges(sigsDs))
      ConnectedComponents.run(signatures.select($"fileId"), edges, cfg.ccMaxIter)
    }

    // 7. metrics
    val files = signatures.count()
    val chunkStats = chunks.agg(
      count(lit(1)), sum($"size")).as[(Long, Long)].head()
    val uniqueStats = unique.agg(
      count(lit(1)), sum($"size")).as[(Long, Long)].head()
    val summary = Summary(
      files = files,
      chunks = chunkStats._1, uniqueChunks = uniqueStats._1,
      totalBytes = chunkStats._2, uniqueBytes = uniqueStats._2,
      candidatePairs = candidates.count(), verifiedPairs = verified.count(),
      clusters = clusters.agg(countDistinct($"clusterId")).as[Long].head())
    TableIO.appendMetrics(spark, root, runId, "summary", Seq(
      "files" -> summary.files.toDouble,
      "chunks" -> summary.chunks.toDouble,
      "unique_chunks" -> summary.uniqueChunks.toDouble,
      "total_bytes" -> summary.totalBytes.toDouble,
      "unique_bytes" -> summary.uniqueBytes.toDouble,
      "dedup_ratio" -> (if (summary.uniqueBytes == 0) 0.0
        else summary.totalBytes.toDouble / summary.uniqueBytes),
      "candidate_pairs" -> summary.candidatePairs.toDouble,
      "verified_pairs" -> summary.verifiedPairs.toDouble,
      "clusters" -> summary.clusters.toDouble))
    sigsDs.unpersist()
    featurized.unpersist()
    summary
  }

  /** The config-driven job: the base clustering run under the config's
    * chunker, PLUS the directive-driven analytics stages the reference's
    * backup/restore pipeline reports (north rule: "reproducing destor's
    * dedup-ratio and restore-locality style benchmarks as Spark
    * aggregation reports"):
    *
    *  - `rewrite-algorithm`/`rewrite-enable-har` ⇒ a checkpointed
    *    `rewrite` stage: the configured fragmentation pass (+ HAR
    *    marking against an empty first-backup sparse list) + the P14
    *    write predicate over the stream recipe, with
    *    rewritten-chunk/byte metrics rows; plus a `har_sparse` stage —
    *    the trimmed sparse-container list a FOLLOW-UP backup would
    *    inherit (the reference persists it the same way between jobs);
    *  - `restore-cache` + `simulation-level restore|all` ⇒ a
    *    checkpointed `restore_sim` stage: per-stream
    *    chunks/bytes/containerReads/speedFactor/cfl under the configured
    *    cache.
    *
    * Every stage resumes by skip like the core stages.
    */
  def run(corpus: Dataset[CorpusFile], root: String, runId: String,
      settings: DestorSettings): Summary = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val summary = run(corpus, root, runId, settings.dedupConfig)
    def stage(name: String)(f: => DataFrame): DataFrame =
      instrumentedStage(spark, root, name, runId)(f)
    lazy val streamRec = DedupPipeline.streamRecipe(
      spark.read.format(TableIO.Format).load(s"$root/recipe")
        .drop("_lineage"))
    val doRewrite =
      settings.rewrite.algorithm != "no" || settings.rewrite.enableHar
    if (doRewrite) {
      val rewriteFresh = !TableIO.committed(s"$root/rewrite")
      val marked = stage("rewrite") {
        val passed = settings.rewritePass(streamRec)
        val hared =
          if (settings.rewrite.enableHar)
            // first backup of this root: no previous sparse list
            Rewrite.harMark(passed, Seq.empty[Long].toDF("containerId"))
          else passed
        Rewrite.writePredicate(hared)
          .select(col("stream"), col("seq"), col("size"), col("containerId"),
            col("dup"), col("write"))
      }
      // metrics append directly after the stage commit (not after
      // har_sparse) so the documented crash window stays minimal
      if (rewriteFresh) {
        val rw = marked.agg(
          sum(when(col("dup") && col("write"), 1L).otherwise(0L)),
          sum(when(col("dup") && col("write"), col("size")).otherwise(0L)))
          .head()
        TableIO.appendMetrics(spark, root, runId, "rewrite", Seq(
          "rewritten_chunks" ->
            (if (rw.isNullAt(0)) 0.0 else rw.getLong(0).toDouble),
          "rewritten_bytes" ->
            (if (rw.isNullAt(1)) 0.0 else rw.getLong(1).toDouble)))
      }
      stage("har_sparse")(Rewrite.harSparseContainers(streamRec,
        settings.rewrite.harUtilizationThreshold,
        settings.rewrite.harRewriteLimit))
    }
    // the recipe the restore simulation replays: AFTER the rewrite pass
    // when one is configured — rewritten duplicates land in fresh packed
    // containers past the current max, exactly like TracePipeline, so the
    // locality report actually shows the rewrite's effect. Built LAZILY
    // (only when the restore_sim stage actually computes) so a pure
    // resume never runs the repack jobs.
    def simRecipe(): DataFrame =
      if (doRewrite) {
        val marked = spark.read.format(TableIO.Format)
          .load(s"$root/rewrite").drop("_lineage")
        val base = marked.agg(max(col("containerId"))).head() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0) + 1L
        }
        val repacked = DedupPipeline.streamPrefix(
            marked.filter(col("dup") && col("write"))
              .select(col("stream"), col("seq"),
                col("size").cast("long").as("sz"), lit("all").as("s")),
            "s", Seq("stream", "seq"), "sz", "pre")
          .withColumn("newCid",
            (lit(base) + floor(greatest(col("pre") + col("sz") - 1, lit(0L))
              / Rewrite.ContainerPayload)).cast("long"))
          .select(col("stream"), col("seq"), col("newCid"))
        marked
          .join(repacked, Seq("stream", "seq"), "left")
          .withColumn("containerId",
            coalesce(col("newCid"), col("containerId")))
          .select(col("stream"), col("seq"), col("containerId"), col("size"))
      } else streamRec
    if (settings.simulationLevel == "restore" ||
        settings.simulationLevel == "all")
      stage("restore_sim")(settings.restoreSim(simRecipe()))
    summary
  }

  /** ONE incremental backup job against a chained container store — the
    * Spark analog of successive `destor /path` invocations sharing a
    * working directory (reference src/do_backup.c: the jobs share the
    * fingerprint index, the container pool and HAR's inter-job sparse
    * list; src/har_rewrite.c:59-117 loads the previous job's monitor
    * state from disk). Each backup gets its OWN checkpoint root; the
    * chain link is `prevRoot` — the completed previous backup's root,
    * whose committed `index` (fp → latest written container) and
    * `har_sparse` stages are this job's inherited store state.
    *
    * The per-chunk semantics are EXACTLY [[TracePipeline.oneJob]] — the
    * same dedup-against-cumulative-index → configured rewrite (+ HAR
    * against the inherited sparse list) → per-occurrence packing →
    * latest-wins index upsert that the trace replay runs in memory —
    * with the read+chunk+hash phases real (the config's chunk-*
    * directives) instead of trace-fed, and every handoff table a
    * checkpointed resumable stage:
    *
    *   chunks       — the chunk table of this corpus snapshot
    *   final_recipe — stream/seq/path/fp/size/dup/write/containerId
    *   index        — cumulative fp → container (for the NEXT backup)
    *   har_sparse   — trimmed sparse list (when HAR is on; NEXT backup)
    *   restore_sim  — configured cache replay (simulation-level
    *                  restore|all)
    *
    * plus a 14-field `backup` metrics block (the backup.log line).
    * Resume-by-skip: re-submitting with the same root recomputes nothing
    * and appends no duplicate metrics; the returned stats are rebuilt
    * from the committed stage tables so fresh and resumed runs return
    * identical values.
    */
  def backup(corpus: Dataset[CorpusFile], root: String, runId: String,
      settings: DestorSettings, prevRoot: Option[String] = None,
      payload: Long = Rewrite.ContainerPayload): TraceJobStats = {
    val spark = corpus.sparkSession
    val chunks = instrumentedStage(spark, root, "chunks", runId) {
      DedupPipeline.chunkTableDF(
          DedupPipeline.featurize(corpus, settings.dedupConfig).toDF())
        .select(col("repo"), col("path"), col("commit"), col("chunkIdx"),
          col("size"), col("fp"), col("zero"))
    }
    backupChunkStream(
      chunks.drop("_lineage")
        .select(
          concat_ws("@", col("repo"), col("path"), col("commit")).as("path"),
          col("chunkIdx"), col("fp"), col("size")),
      root, runId, settings, prevRoot, payload)
  }

  /** The chunk-stream core of [[backup]]: one chained backup job over an
    * ALREADY-CHUNKED stream (columns path, chunkIdx, fp, size — the
    * TraceSource/FslSource read schema). [[backup]] wraps it with the
    * real read+chunk+hash phases; [[graft.streaming.StreamIngest
    * .backupBatch]] feeds it micro-batches, so batch snapshots, trace
    * replay and continuous streaming ingestion all share ONE store
    * implementation. Checkpointed stages + resume-by-skip as documented
    * on [[backup]].
    */
  def backupChunkStream(chunkStream: DataFrame, root: String, runId: String,
      settings: DestorSettings, prevRoot: Option[String] = None,
      payload: Long = Rewrite.ContainerPayload): TraceJobStats = {
    val spark = chunkStream.sparkSession
    import spark.implicits._
    def stage(name: String)(f: => DataFrame): DataFrame =
      instrumentedStage(spark, root, name, runId)(f)
    val (prevIndex, prevSparse, nextCid, backupId) = prevRoot match {
      case Some(p) =>
        require(TableIO.committed(s"$p/index"),
          s"prevRoot $p has no committed index stage — chain only from a " +
            "completed backup() root")
        val idx = spark.read.format(TableIO.Format).load(s"$p/index")
          .select(col("fp"), col("idxCid"))
        val sp =
          if (TableIO.committed(s"$p/har_sparse"))
            spark.read.format(TableIO.Format).load(s"$p/har_sparse")
              .select(col("containerId"))
          else Seq.empty[Long].toDF("containerId")
        // every written container holds someone's latest copy, so the
        // index max IS the store's high-water container id
        val nc = idx.agg(max(col("idxCid"))).head() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0) + 1L
        }
        // backup id = max surviving "bN" stream label in the prev root's
        // committed recipe table + 1 — the recipe is part of the
        // resumability contract (metrics are not: the documented crash
        // window can lose the metrics row, and a guessed id would
        // duplicate a stream label that expire-by-label later deletes).
        // `final_recipe` is a backup() root; `recipes` an expire() root.
        // Fallback (a zero-row recipe, i.e. a valid empty backup): the
        // metrics backup_id row. Neither present ⇒ fail loudly.
        val recTbl = Seq("final_recipe", "recipes")
          .find(t => TableIO.committed(s"$p/$t"))
        val fromLabels = recTbl.flatMap { t =>
          spark.read.format(TableIO.Format).load(s"$p/$t")
            .select(regexp_extract(col("stream"), "^b(\\d+)$", 1)
              .cast("long").as("bid"))
            .agg(max(col("bid"))).head() match {
            case r if r.isNullAt(0) => None
            case r => Some(r.getLong(0) + 1L)
          }
        }
        val fromMetrics =
          try spark.read.format(TableIO.Format).load(s"$p/metrics")
            .filter(col("stage") === "backup" &&
              col("metric") === "backup_id")
            .agg(max(col("value"))).head() match {
            case r if r.isNullAt(0) => None
            case r => Some(r.getDouble(0).toLong + 1L)
          }
          catch { case _: org.apache.spark.sql.AnalysisException => None }
        val bid = fromLabels.orElse(fromMetrics).getOrElse(
          throw new IllegalStateException(
            s"prevRoot $p has neither 'bN' stream labels in its recipe " +
              "table nor a backup_id metrics row — cannot derive the next " +
              "backup id"))
        (idx, sp, nc, bid)
      case None =>
        (Seq.empty[(String, Long)].toDF("fp", "idxCid"),
          Seq.empty[Long].toDF("containerId"), 0L, 1L)
    }
    val label = s"b$backupId"
    // the whole store step computes lazily and AT MOST ONCE — a pure
    // resume (all stages committed) never forces it
    lazy val res = {
      val stream = chunkStream
        .select(col("path"),
          col("chunkIdx").cast("long").as("chunkIdx"), col("fp"),
          col("size").cast("int").as("size"), lit(label).as("stream"),
          lit(1L).as("one"))
      val seqd = DedupPipeline.streamPrefix(stream, "stream",
          Seq("path", "chunkIdx"), "one", "pre")
        .withColumn("seq", col("pre") + 1L).drop("one", "pre")
      if (seqd.isEmpty)
        // an empty corpus snapshot is a valid no-op backup (the same
        // guard TracePipeline.run applies per trace job — oneJob requires
        // non-empty input): empty recipe, index carried unchanged, empty
        // HAR monitor
        TraceJobResult(
          Seq.empty[(String, Long, String, String, Int, Boolean, Boolean,
              Long)]
            .toDF("stream", "seq", "path", "fp", "size", "dup", "write",
              "containerId"),
          prevIndex, Seq.empty[Long].toDF("containerId"),
          0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
      else
        TracePipeline.oneJob(seqd, prevIndex, prevSparse, nextCid, settings,
          payload)
    }
    val freshFinal = !TableIO.committed(s"$root/final_recipe")
    val finalRec = stage("final_recipe")(res.finalRec)
    stage("index")(res.newIndex)
    val sparseCount =
      if (settings.rewrite.enableHar) stage("har_sparse")(res.sparse).count()
      else 0L
    val fr = finalRec.drop("_lineage")
    // empty committed recipe = a no-op backup (fresh OR resumed): the
    // stats aggregates below would decode null sums, and the restore sim
    // has nothing to replay — zero everything except the backup id
    val frEmpty = fr.isEmpty
    val doSim = (settings.simulationLevel == "restore" ||
      settings.simulationLevel == "all") && !frEmpty
    val sim =
      if (doSim) {
        val s = stage("restore_sim")(settings.restoreSim(
            fr.select(col("stream"), col("seq"), col("containerId"),
              col("size"))))
          .select(col("containerReads"), col("speedFactor"), col("cfl"))
          .as[(Long, Double, Double)].head()
        s
      } else (0L, 0.0, 0.0)
    // stats rebuilt from the committed stage tables — identical whether
    // this run computed the stages or resumed them
    val (files, nChunks, dataSize, uniqC, uniqS, rwC, rwS) =
      if (frEmpty) (0L, 0L, 0L, 0L, 0L, 0L, 0L)
      else fr.agg(
        countDistinct(col("path")), count(lit(1)),
        sum(col("size")).cast("long"),
        sum(when(!col("dup"), 1L).otherwise(0L)),
        sum(when(!col("dup"), col("size")).otherwise(0L)).cast("long"),
        sum(when(col("dup") && col("write"), 1L).otherwise(0L)),
        sum(when(col("dup") && col("write"), col("size")).otherwise(0L))
          .cast("long"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val containersWritten =
      if (frEmpty) 0L
      else fr.filter(col("write")).agg(max(col("containerId"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0) - nextCid + 1L
      }
    val stats = TraceJobStats(backupId, files, nChunks, dataSize,
      uniqC, uniqS, rwC, rwS, uniqS + rwS, containersWritten, sparseCount,
      sim._1, sim._2, sim._3)
    if (freshFinal)
      TableIO.appendMetrics(spark, root, runId, "backup", Seq(
        "backup_id" -> stats.backup_id.toDouble,
        "files" -> stats.files.toDouble,
        "chunks" -> stats.chunks.toDouble,
        "data_size" -> stats.data_size.toDouble,
        "unique_chunks" -> stats.unique_chunks.toDouble,
        "unique_size" -> stats.unique_size.toDouble,
        "rewritten_chunks" -> stats.rewritten_chunks.toDouble,
        "rewritten_size" -> stats.rewritten_size.toDouble,
        "stored_size" -> stats.stored_size.toDouble,
        "containers_written" -> stats.containers_written.toDouble,
        "sparse_containers" -> stats.sparse_containers.toDouble,
        "container_reads" -> stats.container_reads.toDouble,
        "speed_factor" -> stats.speed_factor,
        "cfl" -> stats.cfl))
    stats
  }

  final case class ExpireStats(
      expiredVersion: String, rowsBefore: Long, rowsAfter: Long,
      migratedChunks: Long, migratedBytes: Long,
      containersBefore: Long, containersAfter: Long, indexFps: Long)

  /** Retention over a COMPLETED backup chain — the `destor -d<jobid>`
    * analog for [[backup]] roots (reference: the delete pipeline run
    * between backup jobs, src/do_delete.c). Reads every chain root's
    * committed recipe table (`final_recipe` for backup roots, `recipes`
    * for previous expire roots — retention composes along the chain),
    * expires the backup selected by `expiredBackup` (a stream label such
    * as "b2", or an uncompacted root path) via [[GC.expireChain]]
    * (copy-level liveness — the multi-copy store rewriting produces),
    * and writes a checkpointed compacted root:
    *
    *   migration — (fp, old_cid, size, new_cid) survivor moves
    *   recipes   — every surviving backup's recipe on the post-compaction
    *               layout (version/stream, seq, path, fp, size, dup,
    *               write, containerId)
    *   index     — fp → latest surviving container (the `backup()` chain
    *               contract, so the NEXT backup chains from THIS root)
    *
    * plus a `backup_id` metrics row carrying the chain's surviving
    * high-water id so the next chained backup numbers itself correctly.
    * No `har_sparse` is written: compaction invalidates utilization
    * monitor state (migrated containers are densely packed), so the next
    * backup starts with an empty sparse list — the reference's monitor
    * is likewise rebuilt from post-delete containers. Resume-by-skip
    * like every stage job; stats are rebuilt from the committed tables.
    */
  def expire(spark: SparkSession, chainRoots: Seq[String],
      expiredBackup: String, outRoot: String, runId: String,
      payload: Long = Rewrite.ContainerPayload): ExpireStats = {
    import spark.implicits._
    // a chain root is a backup() root (final_recipe) OR a previous
    // expire() root (recipes, multi-label) — retention composes: the
    // compacted root chains into the next backup AND into the next expiry
    def recTable(r: String): Option[String] =
      Seq("final_recipe", "recipes").find(t => TableIO.committed(s"$r/$t"))
    chainRoots.foreach { r =>
      require(recTable(r).isDefined,
        s"chain root $r has no committed final_recipe/recipes stage — " +
          "expire only completed backup()/expire() roots")
    }
    def stage(name: String)(f: => DataFrame): DataFrame =
      instrumentedStage(spark, outRoot, name, runId)(f)
    def rec(r: String): DataFrame =
      spark.read.format(TableIO.Format).load(s"$r/${recTable(r).get}")
        .drop("_lineage")
    // `expiredBackup` selects ONE backup: either a stream label ("b2") —
    // required when the chain has been compacted before, since a
    // compacted root carries several labels — or, convenience for
    // uncompacted chains, a chain-root path whose recipe has exactly one
    // label
    val expired =
      if (chainRoots.contains(expiredBackup)) {
        val labels = rec(expiredBackup).select(col("stream")).distinct()
          .as[String].collect()
        require(labels.length == 1,
          s"expiredBackup root $expiredBackup carries ${labels.length} " +
            "stream labels — pass the label of the one backup to expire")
        labels.head
      } else expiredBackup
    require(
      chainRoots.exists(r => !rec(r).filter(col("stream") === expired)
        .isEmpty),
      s"no chain root carries stream label '$expired'")
    // the whole expiry computes lazily and at most once (pure resumes
    // never force it); version = the backup's stream label
    lazy val res = GC.expireChain(
      chainRoots.map(rec).reduce(_ unionByName _)
        .withColumn("version", col("stream")),
      expired, payload)
    val freshMig = !TableIO.committed(s"$outRoot/migration")
    val migration = stage("migration")(res.migration)
    val recipes = stage("recipes") {
      res.recipes.drop("version")
    }
    val index = stage("index")(res.index)
    val before = chainRoots.map(rec).reduce(_ unionByName _)
      .agg(count(lit(1)), countDistinct(col("containerId")))
      .as[(Long, Long)].head()
    val after = recipes.drop("_lineage")
      .agg(count(lit(1)), countDistinct(col("containerId")))
      .as[(Long, Long)].head()
    val mig = migration.drop("_lineage")
      .agg(count(lit(1)), coalesce(sum(col("size")), lit(0L)))
      .as[(Long, Long)].head()
    val maxBid = recipes.drop("_lineage")
      .select(regexp_extract(col("stream"), "^b(\\d+)$", 1).cast("long")
        .as("bid"))
      .agg(max(col("bid"))).head() match {
      case r if r.isNullAt(0) => 1L
      case r => r.getLong(0)
    }
    val stats = ExpireStats(expired, before._1, after._1, mig._1, mig._2,
      before._2, after._2, index.count())
    if (freshMig) {
      TableIO.appendMetrics(spark, outRoot, runId, "backup", Seq(
        "backup_id" -> maxBid.toDouble))
      TableIO.appendMetrics(spark, outRoot, runId, "expire", Seq(
          "rows_before" -> stats.rowsBefore.toDouble,
          "rows_after" -> stats.rowsAfter.toDouble,
          "migrated_chunks" -> stats.migratedChunks.toDouble,
          "migrated_bytes" -> stats.migratedBytes.toDouble,
          "containers_before" -> stats.containersBefore.toDouble,
          "containers_after" -> stats.containersAfter.toDouble,
          "index_fps" -> stats.indexFps.toDouble))
    }
    stats
  }

  /** `destor -t` body, shared by the CLI arm and TraceCliSpec: chunk +
    * hash the corpus with the configured chunker and write the
    * reference-format `.trace` file (one `repo@path@commit` stream per
    * file version — commit is part of the key, or two versions of one
    * path would merge into a single block with colliding chunk indices).
    * Returns the chunk count the CLI reports.
    */
  def trace(corpus: Dataset[CorpusFile], outFile: String,
      cfg: DedupConfig): Long = {
    val chunks = DedupPipeline.chunkTableDF(
        DedupPipeline.featurize(corpus, cfg).toDF())
      .select(concat_ws("@", col("repo"), col("path"), col("commit"))
          .as("path"),
        col("chunkIdx"), col("fp"), col("size"))
    val n = chunks.count()
    graft.sources.TraceSource.write(chunks, outFile)
    n
  }

  /** spark-submit entry:
    * ClusterJob <corpusParquet> <checkpointRoot> [runId] [destor.config]
    *   [prevRoot|-]
    *
    * The optional 4th argument is a destor-config file (the reference's
    * own directive language, [[DestorConfig]]) — its chunk-* directives
    * configure the pipeline, so `destor /path` invocations carry their
    * config straight over. When a 5th argument is present the job runs
    * in incremental-backup mode ([[backup]]): `-` starts a fresh chain,
    * a path chains from that completed backup root's store state.
    *
    * Retention mode (`destor -d<jobid>`):
    * ClusterJob expire <outRoot> <labelOrRoot> <root1,root2,...> [runId]
    * — expires one backup of a completed chain ([[expire]]; select by
    * stream label, e.g. b2, or by an uncompacted root path) and writes
    * the compacted root the next chained backup OR the next expiry
    * submits against.
    *
    * Restore mode (`destor -r<jobid> /path`):
    * ClusterJob restore <corpusParquet> <outDir> [destor.config]
    * — materializes the snapshot's directory tree under outDir via the
    * dedup store ([[Restore.materialize]]: recipe ⋈ first-writer chunk
    * bytes, executor-side streaming writes) and prints the per-file
    * sha256 verification tally, the reference's `-r` + md5-check mode.
    * The config's chunk-* directives select the chunker, exactly as the
    * backup-mode config does.
    *
    * Trace mode (`destor -t /path`, reference src/destor.c:347-357 →
    * make_trace in src/trace_phase.c):
    * ClusterJob trace <corpusParquet> <outTraceFile> [destor.config]
    * — chunks + hashes the corpus with the configured chunker and writes
    * the reference-format text `.trace` file ([[graft.sources
    * .TraceSource.write]], byte-exact both ways), completing the
    * reference's four-job command surface (backup/restore/expire/trace).
    * The emitted trace feeds the simulation-level pipeline
    * ([[TracePipeline]]) the same way the reference's traces feed
    * `simulation-level all` runs.
    */
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("trace")) {
      val Array(_, corpusPath, outFile) = args.take(3)
      val cfg = args.lift(3).map { cfgPath =>
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(cfgPath)),
          java.nio.charset.StandardCharsets.UTF_8)
        DestorConfig.parse(text).dedupConfig
      }.getOrElse(DedupConfig())
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val corpus = spark.read.parquet(corpusPath).as[CorpusFile]
      val n = trace(corpus, outFile, cfg)
      println(s"[clusterjob] trace chunks=$n out=$outFile")
      spark.stop()
      return
    }
    if (args.headOption.contains("restore")) {
      val Array(_, corpusPath, outDir) = args.take(3)
      val cfg = args.lift(3).map { cfgPath =>
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(cfgPath)),
          java.nio.charset.StandardCharsets.UTF_8)
        DestorConfig.parse(text).dedupConfig
      }.getOrElse(DedupConfig())
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val corpus = spark.read.parquet(corpusPath).as[CorpusFile]
      val res = Restore.materialize(corpus, cfg, outDir)
      val tally = res.agg(count(lit(1)).as("files"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("restored_ok"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("restored_bad")).head()
      println(s"[clusterjob] restore files=${tally.getLong(0)} " +
        s"ok=${tally.getLong(1)} bad=${tally.getLong(2)} out=$outDir")
      spark.stop()
      return
    }
    if (args.headOption.contains("expire")) {
      val Array(_, outRoot, expiredBackup, chain) = args.take(4)
      val runId = args.lift(4).getOrElse(s"gc-${java.util.UUID.randomUUID()}")
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val stats = expire(spark, chain.split(',').toSeq, expiredBackup,
        outRoot, runId)
      println(s"[clusterjob] $stats")
      spark.stop()
      return
    }
    val Array(corpusPath, root) = args.take(2)
    val runId = args.lift(2).getOrElse(s"run-${java.util.UUID.randomUUID()}")
    val settings = args.lift(3).map { cfgPath =>
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(cfgPath)),
        java.nio.charset.StandardCharsets.UTF_8)
      DestorConfig.parse(text)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = spark.read.parquet(corpusPath).as[CorpusFile]
    val s: Any = (settings, args.lift(4)) match {
      case (st, Some(prev)) => // incremental-backup mode
        backup(corpus, root, runId, st.getOrElse(DestorSettings()),
          Some(prev).filter(_ != "-"))
      case (Some(st), None) => run(corpus, root, runId, st)
      case (None, None) => run(corpus, root, runId, DedupConfig())
    }
    println(s"[clusterjob] $s")
    spark.stop()
  }
}
