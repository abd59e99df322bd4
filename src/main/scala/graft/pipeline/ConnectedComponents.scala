package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative connected components over an edge DataFrame by min-label
  * propagation (the dedup-cluster step of SURVEY.md §7.1 stage 7).
  *
  * Each iteration is one shuffle round: symmetrized edges join the current
  * labels, each vertex takes the min of its own and its neighbours'
  * labels. Near-dup clusters are dense (diameter 2-3 via their hub), so
  * convergence is fast; every round is checkpointed (localCheckpoint) to
  * truncate lineage for long chains — the classic iterative-join pitfall.
  *
  * Input: vertices(fileId), edges(a,b). Output: (fileId, clusterId) where
  * clusterId = min fileId of the component; singletons keep their own id.
  */
object ConnectedComponents {

  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = vertices.sparkSession
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist()
    sym.count() // materialize once; reused every round

    var labels = vertices.select(col("fileId"), col("fileId").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val incoming = sym
        .join(labels.withColumnRenamed("fileId", "src"), Seq("src"))
        .groupBy(col("dst").as("fileId"))
        .agg(min(col("label")).as("nbrMin"))
      val next = labels
        .join(incoming, Seq("fileId"), "left")
        .select(col("fileId"),
          least(col("label"), coalesce(col("nbrMin"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("fileId"))
        .filter(col("label") =!= col("old"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("label", "clusterId")
  }
}
