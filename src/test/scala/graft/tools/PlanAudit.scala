package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Shared physical-plan audit for the headline queries: the round-3/4
  * window-elimination and join-shape wins are asserted here so they cannot
  * silently regress. [[ExplainPlans]] prints the full plans for eyeballs
  * (and exits nonzero on violations); [[graft.plans.PlanAuditSpec]] wires
  * the same checks into `sbt test`.
  *
  * Violations:
  *  - `CartesianProduct` — never allowed (all pair fan-out in the engine is
  *    keyed: gram-, band-, prefix- or digest-keyed).
  *  - `BroadcastNestedLoopJoin` — allowed only where the build side is a
  *    documented O(1)-row scalar (crossJoin with a 1-2 row aggregate).
  *  - `Window` — allowed only where the partition key is compound and
  *    per-group cardinality is bounded by construction (the round-3 rule:
  *    no `Window.partitionBy(stream)` over unbounded streams).
  *  - a full-width `documents` scan (all 5 columns) — every audited query
  *    needs a strict subset, so reading the full row means column pruning
  *    broke.
  *
  * Caveat: a query whose result is eagerly localCheckpoint-materialized
  * exposes only its FINAL stage's plan here (the checkpoint truncates the
  * lineage) — the audit asserts that stage, and the stages behind the
  * checkpoint are covered by the `grep -rn "Window.partitionBy" src/main`
  * review rule (every remaining site partitions by a bounded or compound
  * key, or is a labeled small-n baseline — see the table in SURVEY.md
  * §2.10 and the round-5 rewires in Similarity).
  */
object PlanAudit {

  /** Headline queries under audit. Keep in sync with the comments below —
    * each group documents what its plans must NOT contain.
    */
  val audited: Seq[String] = Seq(
    "q1_agg", "q_broadcast_join", "q_semi_join",
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
    "d_merkle_prune",
    // round-5 additions: exact dedup + the composed curation pass are
    // md5-keyed combinable aggs; self-rep is strictly map-only; the trim
    // action re-joins spans doc-keyed; the restore twin is fp-/fileId-
    // keyed joins + an in-partition secondary sort (SortExec within
    // partitions is fine — the rule bans WindowExec, not local sort);
    // IVF probes via bucket-keyed joins with broadcast centroids; the
    // packing cumsum is two-phase (no global window); media stats are a
    // map-only decode
    "d_exact_dedup", "d_curation", "d_self_rep", "d_dup_trim",
    "d_restore_md5", "e_ivf_topk", "q_cum_packing", "m_media_stats",
    // SemDeDup: intra-cluster duels via ONE listId-keyed equi-join of
    // the checkpointed assignment (k-means lineage truncated) — no
    // windows, no cartesians, no all-pairs
    "e_semdedup",
    // PII scrub: strictly map-only (pruned (doc_id, text) scan, codegen
    // regexp builtins, zero shuffles)
    "d_pii_scrub",
    // gram familiarity: bounded (charset³) model BROADCAST into the
    // scoring join — the occurrence stream never shuffles on gram; one
    // model agg + one doc rollup, no windows, no cartesians
    "d_gram_quality",
    // domain quota sampling: ONE map-side-combinable top_k_by per
    // source — no row_number window funneling a task per mega-domain
    "d_quota_sample",
    // vocab/OOV: bounded-cardinality token agg + global TakeOrdered
    // top-V + BROADCAST vocab join — no windows, no full-width scan
    "d_vocab_oov",
    // Bloom ingest gate: broadcast bit-set probe (map-only batch side)
    // + one digest-keyed exact join — no windows, no cartesians
    "d_bloom_dedup",
    // paragraph dedup: map-side window hashing (paragraph text never
    // shuffles), hash-keyed first-writer min(struct), doc-keyed rollup
    // + map-side reconstruction — no windows, no per-doc sort tasks
    "d_para_dedup",
    // tf·idf top terms: 8-byte token-id streams, broadcast df/vocab
    // joins, per-doc top_k_by — no row_number window
    "d_tfidf_topterms",
    // mixture apportionment: bounded stratum census, scalar crossJoins
    // + bounded×bounded remainder-rank self-join (BNLJ allowlisted),
    // selection via top_k_by — no windows
    "d_mix_alloc",
    // language rebalance: bounded census/targets (BNLJ allowlisted),
    // per-lang rank via the two-phase streamPrefix — never a
    // row_number window over a mega-language partition
    "d_lang_balance",
    // shard balance: map-side assignment + one S-row agg + scalar
    // crossJoin (BNLJ allowlisted) — no windows, no cartesians
    "d_shard_stats")

  /** Queries whose plans may contain Window operators: every window here
    * partitions by a compound key whose per-group size is bounded by the
    * engine's own construction (cbr: (stream, containerId) inside one
    * rewrite buffer; cap: (stream, bufferId) with buffer size ≤ capping
    * window) — the grain the round-3 directive explicitly allows.
    */
  val windowAllowed: Set[String] = Set("r_cbr_rewrite")

  /** Queries whose plans may contain BroadcastNestedLoopJoin: only
    * documented bounded-build-side crossJoins — d_backup_stats joins a
    * checkpointed ≤2-row aggregate, e_ann_topk (the labeled brute-force
    * baseline) broadcasts its 20-row query side and streams the corpus
    * past it (brute-force scoring is all-pairs by definition; the scale
    * path is e_ivf_topk / e_lsh_dedup).
    */
  /** d_mix_alloc additionally joins its METADATA-bounded stratum census
    * (langs × sources rows) to itself non-equi for the largest-remainder
    * rank — corpus size never enters any of its BNLJ sides.
    */
  val bnljAllowed: Set[String] =
    Set("d_backup_stats", "e_ann_topk", "d_mix_alloc",
      "d_lang_balance", "d_shard_stats")

  final case class Audit(name: String, plan: String, violations: Seq[String])

  /** All five `documents` columns in one ReadSchema line ⇒ pruning broke. */
  private val fullDocScan =
    Seq("doc_id", "text", "lang", "source", "n_chars")

  def audit(spark: SparkSession, dir: String, name: String): Audit = {
    val plan = graft.Queries.all(name)(spark, dir)
      .queryExecution.explainString(FormattedMode)
    val v = Seq.newBuilder[String]
    if (plan.contains("CartesianProduct"))
      v += "CartesianProduct in plan"
    if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
      v += "BroadcastNestedLoopJoin in plan (not an allowed scalar crossJoin)"
    // FormattedMode gives every physical node a "(n) NodeName" detail
    // header — match those, not free text (a column named "window" in a
    // schema line must not trip the gate).
    val hasWindow =
      "(?m)^\\(\\d+\\) (Window|WindowGroupLimit)\\b".r.findFirstIn(plan).isDefined
    if (hasWindow && !windowAllowed(name))
      v += "Window operator in plan (round-3 rule: windows only on bounded compound keys)"
    for (line <- plan.linesIterator if line.contains("ReadSchema:")
         if fullDocScan.forall(line.contains))
      v += s"unpruned full-width documents scan: ${line.trim}"
    Audit(name, plan, v.result())
  }

  def auditAll(spark: SparkSession, dir: String): Seq[Audit] =
    audited.map(audit(spark, dir, _))
}
