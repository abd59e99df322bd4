package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed GENERALIZED SUFFIX ARRAY by prefix doubling — the literal
  * "suffix-array substring matching" structure (Lee et al. 2021 build it
  * single-node per shard; Flick & Aluru, SC'15, give the distributed
  * sort-based formulation this follows), re-expressed Spark-first: no
  * suffix string is ever materialized or shuffled — only (doc, pos,
  * rank) triples — and every global rank is a two-phase range-partition
  * + O(partitions) offset broadcast (the
  * [[graft.pipeline.DedupPipeline.streamPrefix]] pattern inlined over
  * sorted partitions), never a global window.
  *
  * Semantics: ranks all suffixes of all documents in one global
  * lexicographic order (codepoint order — identical to UTF-8 byte order,
  * which is what SQL binary collation compares). Suffixes never cross
  * document boundaries; identical suffixes from different documents (or
  * positions) share a DENSE rank, exactly `dense_rank() OVER (ORDER BY
  * suffix)` — which is how DuckDB replays the whole structure for the
  * `d_suffix_rank` oracle.
  *
  * Algorithm: rank_1 = dense rank of the first codepoint; round k
  * re-keys every suffix by (rank_k(pos), rank_k(pos+k) or 0) — 0 for
  * "suffix ends within k" sorts first, shorter-prefix-first — and
  * re-densifies; after ceil(log2(maxLen)) rounds ranks order by the full
  * suffix. Ties that survive all rounds are genuinely identical
  * suffixes. Two early exits, both read off the rank pass's own stats
  * (no extra job): all ranks distinct, or a FIXED POINT — the distinct-
  * rank count did not grow in a round, so no class split occurred; keys
  * are a function of the (unchanged) rank partition, hence no class can
  * ever split again.
  *
  * Scale shape: the initial explode is one 24-byte row per text
  * codepoint (the suffix array is Θ(corpus length) by definition — the
  * same inherent volume [[graft.Queries.dDupSpans]] documents); each
  * round is ONE doc-keyed hash join (the rank(pos+k) shift) + ONE range
  * partition with in-partition sort whose two mapPartitions passes
  * assign dense ranks from broadcast per-partition offsets (equal keys
  * land in one partition under RangePartitioner, so offsets are exact).
  * Per-round lineage is truncated by eager localCheckpoint (the
  * iterative-join rule [[graft.pipeline.ConnectedComponents]] follows;
  * blocks are MEMORY_AND_DISK, so storage pressure spills rather than
  * losing truncated lineage). Rounds ≤ log2(max document length) — 12
  * for 4k-char source files — independent of corpus size, so the 100 TB
  * cost is ~24 shuffles of Θ(corpus) fixed-width rows: heavy but exactly
  * the published distributed-SA cost, and the reason the gram-sketch
  * passes (`d_dup_spans`, `d_winnow`) exist as the cheaper defaults.
  */
object SuffixArray {

  /** (doc_id: Long, text: String) → (doc_id, pos, srank): 1-based
    * codepoint position (SQL substr coordinates) and the dense global
    * suffix rank.
    */
  def ranks(docs: DataFrame): DataFrame = doubling(docs, Long.MaxValue)

  /** Ranks ordered by only the first L codepoints (L a power of two):
    * the doubling loop stops once the order covers L — so positions with
    * ≥ L codepoints remaining share a rank iff their first L codepoints
    * are identical (shorter suffixes rank by their full content,
    * termination-first, as in [[ranks]]). This is the exact,
    * collision-free form of the hashed 16-cp grams the sketch passes
    * ([[graft.Queries.dDupSpans]]) key on: ≤ 1+log2(L) bounded shuffle
    * rounds, Θ(corpus) fixed-width rows. The early exits remain sound
    * here: at a fixed point the partition can never split again, so the
    * partition at cover L equals the partition already reached.
    */
  def prefixRanks(docs: DataFrame, L: Long): DataFrame = {
    require(L >= 1 && (L & (L - 1)) == 0, s"L must be a power of two, got $L")
    doubling(docs, L)
  }

  /** The doubling loop, covering min(bound, maxLen) codepoints. */
  private def doubling(docs: DataFrame, bound: Long): DataFrame = {
    val maxLen = docs
      .agg(coalesce(max(length(col("text"))), lit(0)).cast("long")).head()
      .getLong(0)
    val limit = math.min(bound, maxLen)
    val rows = explodeCodepoints(docs)
      .select(col("doc_id"), col("pos"),
        col("cp").as("_k1"), lit(0L).as("_k2"))
    var (cur, nd, nRows) = denseRankSorted(rows) // rank_1: first codepoint
    var k = 1L
    var done = k >= limit || nd == nRows
    while (!done) {
      val shifted = cur.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("srank").as("r2"))
      val keyed = cur.join(shifted, Seq("doc_id", "pos"), "left")
        .na.fill(0L, Seq("r2"))
        .select(col("doc_id"), col("pos"),
          col("srank").as("_k1"), col("r2").as("_k2"))
      val (cur2, nd2, _) = denseRankSorted(keyed)
      cur = cur2
      k *= 2
      done = k >= limit || nd2 == nRows || nd2 == nd // distinct | fixed point
      nd = nd2
    }
    cur
  }

  /** (doc_id, text) → one (doc_id, pos, cp) row per codepoint; pos is
    * 1-based in codepoint coordinates (SQL substr semantics).
    */
  private[graft] def explodeCodepoints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val cps = text.codePoints().toArray
        Iterator.tabulate(cps.length)(i => (id, (i + 1).toLong, cps(i).toLong))
      }
      .toDF("doc_id", "pos", "cp")
  }

  /** Dense global rank of (_k1, _k2), ascending: range-partition + sort
    * within partitions (equal keys share a partition, so per-partition
    * distinct-key counts compose exactly), one checkpointed
    * materialization, then a stats pass (per-partition rows + distinct
    * keys → broadcast offsets — also the loop's convergence signal,
    * free) and a lazy map pass assigning `srank`. Returns
    * ((doc_id, pos, srank), total distinct keys, total rows).
    */
  private[graft] def denseRankSorted(keyed: DataFrame): (DataFrame, Long, Long) = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    // The range-partition id is FROZEN into the checkpointed rows
    // (spark_partition_id() evaluated at materialization, above the
    // sort): the lazy rank pass below reads it from the row, never from
    // TaskContext — a downstream coalesce() merges parent partitions
    // into one task and would otherwise feed every parent offset 0.
    val sorted = keyed
      .select(col("doc_id"), col("pos"), col("_k1"), col("_k2"))
      .repartitionByRange(p, col("_k1"), col("_k2"))
      .sortWithinPartitions(col("_k1"), col("_k2"))
      .withColumn("_pid", spark_partition_id().cast("long"))
      .as[(Long, Long, Long, Long, Long)]
      .localCheckpoint(true)
    val stats = sorted.mapPartitions { it =>
      var pid = -1L; var n = 0L; var d = 0L
      var pk1 = 0L; var pk2 = 0L; var first = true
      while (it.hasNext) {
        val r = it.next(); n += 1; pid = r._5
        if (first || r._3 != pk1 || r._4 != pk2) { d += 1; first = false }
        pk1 = r._3; pk2 = r._4
      }
      if (n == 0) Iterator.empty else Iterator.single((pid, n, d))
    }.collect().sortBy(_._1)
    var cum = 0L; var rowsTotal = 0L
    val offsets = stats.map { case (pid, n, d) =>
      val o = pid -> cum; cum += d; rowsTotal += n; o
    }.toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val ranked = sorted.mapPartitions { it =>
      var curPid = -1L; var rank = 0L
      var pk1 = 0L; var pk2 = 0L; var first = true
      it.map { r =>
        if (r._5 != curPid) { curPid = r._5; rank = bc.value(curPid); first = true }
        if (first || r._3 != pk1 || r._4 != pk2) { rank += 1; first = false }
        pk1 = r._3; pk2 = r._4
        (r._1, r._2, rank)
      }
    }.toDF("doc_id", "pos", "srank")
    (ranked, cum, rowsTotal)
  }
}
