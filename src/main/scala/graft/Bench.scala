package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline.{DedupConfig, DedupPipeline}

/** Per-round benchmark: headline operator queries on SPARK_GRAFT_SF_DIR
  * plus the end-to-end dedup-cluster pipeline on a deterministic synthetic
  * corpus. Prints ONE JSON line.
  */
object Bench {

  /** Headline subset: the shuffle/window/join-heavy operators plus the
    * flagship pipeline-on-documents query. Round-1 names kept stable for
    * round-over-round comparison; round 2 adds the scalable embedding
    * dedup and the uncapped rare-gram Jaccard join. (d_minhash_cluster is
    * deliberately NOT here: its md5 band hashing exists for DuckDB
    * replayability, not production speed — the production clustering
    * path benched is d_doc_clusters/dedup_pipeline.)
    */
  val headline: Seq[String] = Seq(
    "q1_agg", "q_first_writer", "q_topk_per_group", "q_cum_packing",
    "q_broadcast_join", "q_distinct_agg", "q_lru_stack", "q_min_sample",
    "q_segment_bounds", "d_exact_dedup", "d_ngram_shingles", "d_fingerprint",
    "d_doc_clusters", "e_ann_topk", "e_lsh_buckets",
    "e_lsh_dedup", "d_ngram_jaccard_pairs", "q_quantile", "d_curation",
    "d_winnow_pairs", "e_quantize_stats", "d_backup_stats", "e_pq_topk",
    "e_pq_adc", "d_dup_spans", "d_dup_span_pairs", "d_dup_trim",
    "d_decontam", "d_clone_pairs", "d_self_rep", "d_suffix_rank",
    "q_topk_agg", "d_repo_forks", "d_merkle_dirs", "e_semdedup",
    "d_pii_scrub", "d_gram_quality",
    "d_quota_sample", "d_vocab_oov", "d_bloom_dedup",
    "d_para_dedup", "d_tfidf_topterms", "d_mix_alloc",
    "d_lang_balance", "d_shard_stats")

  /** Materialize the synthetic corpus as a parquet table once (this is
    * input scaffolding, not the engine — the north-rule job reads an
    * Iceberg-shaped table, so the bench reads parquet).
    */
  def corpusPath(spark: SparkSession, nBases: Long): String = {
    val path = s"/tmp/graft_bench_corpus_$nBases"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      CorpusGen.generate(spark, nBases)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** End-to-end dedup-cluster job over the parquet corpus: featurize →
    * exact chunk-level dedup stats → LSH/verify/cluster. Only the narrow
    * signature projection is cached; the chunk stream is aggregated in
    * the same pass.
    */
  def runPipeline(spark: SparkSession, nBases: Long): (Long, Double) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cfg = DedupConfig()
    val files = spark.read.parquet(corpusPath(spark, nBases))
      .as[graft.corpus.CorpusFile]
    val t0 = System.nanoTime()
    // one featurize pass, cached columnar while the chunk stats and the
    // narrow signature projection are taken from it
    val fdf = DedupPipeline.featurize(files, cfg).toDF().persist()
    val nFiles = fdf.count()
    // destor-parity dedup ratio over the chunk stream
    DedupPipeline.chunkTableDF(fdf)
      .agg(count(lit(1)), sum($"size"), countDistinct($"fp")).collect()
    // clustering re-reads the signatures ~5× (banding, two verify joins,
    // exact edges, vertices): cache ONLY the narrow projection and free
    // the wide chunk-bearing cache before the shuffle-heavy phase — the
    // wide blocks otherwise crowd the storage pool exactly when the
    // shuffles need the memory
    val sigs = fdf.select($"fileId", $"sha256", $"shingles", $"minhash")
      .as[graft.pipeline.FileSig].persist()
    sigs.count()
    fdf.unpersist(blocking = true) // async removal would let the wide
    // blocks linger into exactly the shuffles this frees memory for
    val clusters = DedupPipeline.clusterSigs(sigs, cfg)
    clusters.count()
    val dt = (System.nanoTime() - t0) / 1e9
    sigs.unpersist()
    (nFiles, dt)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBases = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASES", "20000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // corpus parquet compresses ~3×: split small enough that featurize
      // parallelism is never input-bound at any core count (same setting
      // as BenchScaling)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Steady-state warm-up (excluded from all timings): first query in a
    // fresh JVM otherwise pays ~4s of one-time JIT + codegen + parquet
    // footer reads that belong to session startup, not the operator.
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    SparkEntry.queries("d_exact_dedup")(spark, sfDir).count()

    // Best-of-2 per query: single samples on this shared host swing 2-5×
    // with co-tenant bursts (BASELINE.md noise rules), and the driver runs
    // this main exactly once per round.
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        def sample(): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
          ((System.nanoTime() - t0) / 1e9, n)
        }
        // min over SUCCESSFUL samples only: a fast-failing sample must not
        // mask the real time (and a genuine failure must stay visible as a
        // short run with n = -1, not disappear)
        val ss = Seq(sample(), sample())
        val ok = ss.filter(_._2 >= 0)
        name -> (if (ok.nonEmpty) ok.minBy(_._1) else ss.minBy(_._1))
      }
    }

    // The pipeline leg runs in a FRESH session — the same methodology as
    // BenchScaling.once — because the query sweep leaves session state
    // (lingering localCheckpoint blocks, shuffle files, codegen classes,
    // a pressured heap) that was measured to swing the pipeline sample
    // up to 5x. Warm-up run + best-of-3 per the BASELINE.md noise rules:
    // single samples on this shared host swing 2-5x with co-tenant bursts.
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark2 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .getOrCreate()
    spark2.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    runPipeline(spark2, math.max(nBases / 10, 1000)) // JIT/codegen warm-up
    // best-of-3 wall + min process-CPU: identical runs minutes apart have
    // measured 16s..130s wall and 240s..519s CPU under co-tenant bursts;
    // the minima are the engine numbers, the spread is the host
    val samples = (0 until 3).map { _ =>
      val c0 = osBean.getProcessCpuTime
      val r = runPipeline(spark2, nBases)
      (r._1, r._2, (osBean.getProcessCpuTime - c0) / 1e9)
    }
    val (nFiles, pipeSec, _) = samples.minBy(_._2)
    val pipeCpuSec = samples.map(_._3).min
    val filesPerSec = nFiles / pipeSec

    val qs = (results.map { case (k, (s, _)) => s""""$k":$s""" } :+
      s""""dedup_pipeline":$pipeSec""").mkString("{", ",", "}")
    val total = results.map(_._2._1).sum + pipeSec
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""pipeline_files":$nFiles,"pipeline_sec":$pipeSec,""" +
      s""""pipeline_cpu_sec":$pipeCpuSec,""" +
      s""""files_per_sec":$filesPerSec,"cpus":$cpus,"sf":"$sfDir"}"""
    // The ONE JSON line (sbt run / outputStrategy is StdoutOutput so no
    // [info] prefix), plus a file copy — round 1's bench JSON drowned in
    // sbt log noise and the driver recorded parsed:null.
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark2.stop()
  }
}
