package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.AccumulatorV2

/** Exact big-integer sum accumulator (label sums overflow Long). */
final class BigIntAccumulator extends AccumulatorV2[Long, BigInt] {
  private var sum: BigInt = BigInt(0)
  override def isZero: Boolean = sum == 0
  override def copy(): BigIntAccumulator = {
    val a = new BigIntAccumulator; a.sum = sum; a
  }
  override def reset(): Unit = sum = 0
  override def add(v: Long): Unit = sum += v
  override def merge(other: AccumulatorV2[Long, BigInt]): Unit =
    sum += other.value
  override def value: BigInt = sum
}

/** Iterative connected components by min-label propagation (SURVEY.md
  * §7.1 stage 7).
  *
  * Scale design:
  *  - iteration runs over *edge vertices only*; singleton files never
  *    enter the loop and are appended with their own id at the end;
  *  - labels only ever decrease, so Σlabel is strictly decreasing until
  *    fixpoint; the sum is collected by an accumulator DURING the round's
  *    localCheckpoint materialization — exactly one Spark job per round;
  *  - localCheckpoint truncates lineage (the classic iterative-join
  *    pitfall);
  *  - near-dup clusters are dense (exact dups arrive as star edges around
  *    the min id; verified pairs are near-cliques), so rounds ≈ component
  *    diameter stay small.
  *
  * Input: vertices(fileId), edges(a,b). Output: (fileId, clusterId) where
  * clusterId = min fileId of the component; singletons keep their own id.
  */
object ConnectedComponents {

  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext

    // cache pre-partitioned by the per-round join key: rounds shuffle only
    // the (small) labels side, never the edge table
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist()

    // round 0 fused into initialization: label = min(self, direct nbrs)
    var labels: Dataset[(Long, Long)] = sym
      .groupBy(col("src").as("fileId"))
      .agg(min(col("dst")).as("nbrMin"))
      .select(col("fileId"), least(col("fileId"), col("nbrMin")).as("label"))
      .as[(Long, Long)]
      .localCheckpoint(true)

    var prevSum: Option[BigInt] = None
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val incoming = sym
        .join(labels.toDF("src", "label"), Seq("src"))
        .groupBy(col("dst").as("fileId"))
        .agg(min(col("label")).as("nbrMin"))
      val acc = new BigIntAccumulator
      sc.register(acc, s"cc-label-sum-$iter")
      labels = labels.toDF("fileId", "label")
        .join(incoming, Seq("fileId"), "left")
        .select(col("fileId"),
          least(col("label"), coalesce(col("nbrMin"), col("label"))).as("label"))
        .as[(Long, Long)]
        .map { kv => acc.add(kv._2); kv }
        .localCheckpoint(true) // the only job this round; fills acc
      val s = acc.value
      converged = prevSum.contains(s)
      prevSum = Some(s)
      iter += 1
    }
    if (sys.env.contains("GRAFT_CC_VERBOSE"))
      println(s"[cc] converged=$converged rounds=$iter")
    sym.unpersist()

    val labelsDf = labels.toDF("fileId", "clusterId")
    val singletons = vertices
      .join(labelsDf, Seq("fileId"), "left_anti")
      .select(col("fileId"), col("fileId").as("clusterId"))
    labelsDf.union(singletons)
  }
}
