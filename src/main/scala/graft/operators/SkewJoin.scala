package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key split join ("salting" done the cheap way) for the star-edge
  * shape this engine produces on purpose: hub-star linearization caps a
  * bucket's pair explosion at O(n) edges, but concentrates those n rows
  * on ONE join key (the hub). A plain shuffle join then sends every hub
  * row to a single reducer — the classic straggler.
  *
  * Instead of salting both sides R ways (which replicates the whole
  * lookup table R times), split by measured key frequency:
  *
  *  - keys with count > hotThreshold join via BROADCAST of just their
  *    lookup rows (bounded: there are at most |left|/hotThreshold hot
  *    keys, and the lookup side is one row per key);
  *  - the cold remainder joins with a normal shuffle hash join (AQE
  *    skew-split already handles its mild tail).
  *
  * The frequency scan is a map-side-combinable count — never a
  * collect_list (a hub with 10M spokes at 10^12-file scale must count,
  * not materialize).
  */
object SkewJoin {

  /** Join `big` with one-row-per-key `lookup` on `key`, routing hot keys
    * through a broadcast join. Output = big ⋈ lookup (inner), same rows
    * as a plain join, robust to any single key dominating `big`.
    */
  def lookupJoin(big: DataFrame, lookup: DataFrame, key: String,
      hotThreshold: Long = 100000L): DataFrame = {
    // materialized once (tiny): reused three times below — without the
    // checkpoint each use would recompute the frequency scan over `big`
    val hotKeys = big.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > hotThreshold)
      .select(col(key))
      .localCheckpoint(true)
    if (hotKeys.isEmpty) return big.join(lookup, Seq(key))
    val hotLookup = lookup.join(broadcast(hotKeys), Seq(key), "left_semi")
    // both splits of `big` are broadcast-side filters — the hot rows never
    // enter a shuffle at all, which is the whole point (anti-joining them
    // out AFTER a shuffle would still send them to one reducer first)
    val hotPart = big.join(broadcast(hotLookup), Seq(key))
    val coldPart = big.join(broadcast(hotKeys), Seq(key), "left_anti")
      .join(lookup, Seq(key))
    hotPart.unionByName(coldPart)
  }
}
