package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed GENERALIZED SUFFIX ARRAY by prefix doubling — the literal
  * "suffix-array substring matching" structure (Lee et al. 2021 build it
  * single-node per shard; Flick & Aluru, SC'15, give the distributed
  * sort-based formulation this follows), re-expressed Spark-first: no
  * suffix string is ever materialized or shuffled — only (doc, pos,
  * rank) triples — and every global rank is the repo's two-phase
  * range-partition + O(partitions) offset exchange
  * ([[graft.pipeline.DedupPipeline.streamPrefix]] with one constant
  * stream), never a global window.
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
  * suffixes.
  *
  * Scale shape: the initial explode is one 24-byte row per text
  * codepoint (the suffix array is Θ(corpus length) by definition — the
  * same inherent volume [[graft.Queries.dDupSpans]] documents); each
  * round is three hash shuffles + one range partition over those fixed-
  * width rows (self-join for rank(pos+k), distinct keys, join-back), all
  * AQE-coalescible, with per-round lineage truncated by eager
  * localCheckpoint (the iterative-join rule
  * [[graft.pipeline.ConnectedComponents]] follows). Early exit when all
  * ranks are distinct. Rounds = log2(max document length) — 12 for
  * 4k-char source files — independent of corpus size, so the 100 TB cost
  * is ~40 shuffles of Θ(corpus) fixed-width rows: heavy but exactly the
  * published distributed-SA cost, and the reason the gram-sketch passes
  * (`d_dup_spans`, `d_winnow`) exist as the cheaper defaults.
  */
object SuffixArray {

  /** (doc_id: Long, text: String) → (doc_id, pos, srank): 1-based
    * codepoint position (SQL substr coordinates) and the dense global
    * suffix rank.
    */
  def ranks(docs: DataFrame): DataFrame = {
    val rows = explodeCodepoints(docs)
    val maxLen = docs
      .agg(coalesce(max(length(col("text"))), lit(0)).cast("long")).head()
      .getLong(0)
    var cur = denseRank(rows, col("cp"), lit(0L)) // rank_1: first codepoint
      .select(col("doc_id"), col("pos"), col("srank"))
      .localCheckpoint(true)
    val nRows = cur.count()
    var k = 1L
    var done = k >= maxLen || distinctRanks(cur) == nRows
    while (!done) {
      val shifted = cur.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("srank").as("r2"))
      val keyed = cur.join(shifted, Seq("doc_id", "pos"), "left")
        .na.fill(0L, Seq("r2"))
      cur = denseRank(keyed, col("srank"), col("r2"))
        .select(col("doc_id"), col("pos"), col("srank"))
        .localCheckpoint(true)
      k *= 2
      done = k >= maxLen || distinctRanks(cur) == nRows
    }
    cur
  }

  /** Ranks ordered by only the first L codepoints (L a power of two):
    * the doubling loop runs a FIXED 1+log2(L) rounds — no convergence
    * counting — so positions with ≥ L codepoints remaining share a rank
    * iff their first L codepoints are identical (shorter suffixes rank
    * by their full content, termination-first, as in [[ranks]]). This is
    * the exact, collision-free form of the hashed 16-cp grams the sketch
    * passes ([[graft.Queries.dDupSpans]]) key on: 5 bounded shuffle
    * rounds instead of full convergence, Θ(corpus) fixed-width rows.
    */
  def prefixRanks(docs: DataFrame, L: Long): DataFrame = {
    require(L >= 1 && (L & (L - 1)) == 0, s"L must be a power of two, got $L")
    val rows = explodeCodepoints(docs)
    var cur = denseRank(rows, col("cp"), lit(0L))
      .select(col("doc_id"), col("pos"), col("srank"))
      .localCheckpoint(true)
    var k = 1L
    while (k < L) {
      val shifted = cur.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("srank").as("r2"))
      val keyed = cur.join(shifted, Seq("doc_id", "pos"), "left")
        .na.fill(0L, Seq("r2"))
      cur = denseRank(keyed, col("srank"), col("r2"))
        .select(col("doc_id"), col("pos"), col("srank"))
        .localCheckpoint(true)
      k *= 2
    }
    cur
  }

  /** (doc_id, text) → one (doc_id, pos, cp) row per codepoint; pos is
    * 1-based in codepoint coordinates (SQL substr semantics).
    */
  private def explodeCodepoints(docs: DataFrame): DataFrame = {
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

  private def distinctRanks(cur: DataFrame): Long =
    cur.select(col("srank")).distinct().count()

  /** Dense global rank of (k1, k2) — ascending, nulls absent by
    * construction: distinct keys get a two-phase sequential index (one
    * constant stream through streamPrefix: range partition + per-
    * partition counts + broadcast offsets, no window), then join back.
    * Output = input columns plus `srank`.
    */
  private def denseRank(df: DataFrame,
      k1: org.apache.spark.sql.Column,
      k2: org.apache.spark.sql.Column): DataFrame = {
    val keyed = df.withColumn("_k1", k1).withColumn("_k2", k2)
      .drop("srank")
    val keys = keyed.select(col("_k1"), col("_k2")).distinct()
      .withColumn("_g", lit("g")).withColumn("_one", lit(1L))
    val ranked = graft.pipeline.DedupPipeline
      .streamPrefix(keys, "_g", Seq("_k1", "_k2"), "_one", "_pre")
      .select(col("_k1"), col("_k2"), (col("_pre") + 1L).as("srank"))
    keyed.join(ranked, Seq("_k1", "_k2")).drop("_k1", "_k2")
  }
}
