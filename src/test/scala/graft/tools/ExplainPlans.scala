package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection: PushedFilters / ReadSchema pruning /
  * broadcast joins / whole-stage codegen spans for the headline queries.
  * Run: sbt "Test/runMain graft.tools.ExplainPlans"
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("q1_agg", "q_broadcast_join", "q_semi_join",
        "q_first_writer", "d_token_count", "e_ann_topk",
        "e_lsh_dedup", "d_ngram_jaccard_pairs", "q_quantile",
        "d_winnow", "e_lsh_buckets", "d_backup_stats",
        // round-4 audit: no Window.partitionBy(stream) may appear here —
        // run detection/lag/max are two-phase distributed (streamRuns);
        // cbr's remaining window partitions by (stream, containerId)
        "r_cfl_runs", "r_cbr_rewrite", "r_access_records",
        // chained-store retention: (fp, cid)-keyed shuffles + the
        // two-phase prefix sum only — no windows, no cartesians
        "g_chain_expire", "g_chain_recipes",
        // exact-substring surface: scans must prune to (doc_id, text);
        // no windows (island merges are typed flatMapGroups), no
        // cartesians (pair fan-out is inside the capped gram group)
        "d_dup_spans", "d_dup_span_pairs", "d_decontam",
        // clone detection: prefix-filtered candidate join + sorted-array
        // merge verify — no cartesians; both joins are h-/doc-keyed
        "d_clone_pairs",
        // near-dup retention action: the clustering plan + ONE combinable
        // agg and one cluster-keyed join — no windows, no per-cluster sort
        "d_neardup_prune",
        // native top-k aggregate: ObjectHashAggregate partial/final,
        // zero Window/Sort operators anywhere in the plan
        "q_topk_agg",
        // repo layer: digest-keyed joins only (text pruned at the scan),
        // census rollup is one combinable agg — no windows, no cartesians;
        // prune/deltas are combinable aggs + keyed joins
        "d_repo_forks", "d_merkle_dirs", "d_fork_prune", "d_commit_deltas",
        "d_merkle_prune")) {
      println(s"\n===== $name =====")
      println(graft.Queries.all(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
