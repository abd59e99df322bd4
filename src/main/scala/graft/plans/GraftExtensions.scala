package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, IntersectSorted, JaccardSorted, TopKBy}

/** Engine extensions: registers the native codegen'd expressions with the
  * session so they are callable from SQL.
  *
  * spark-submit path:
  *   `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * programmatic path (e.g. an already-built session):
  *   `GraftExtensions.register(spark)`
  *
  * `SELECT jaccard_sorted(a, b)` → exact Jaccard of two sorted distinct
  * long arrays (the verify join's hot expression).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.jaccardSorted)
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.intersectSorted)
    ext.injectFunction(GraftExtensions.topKBy)
  }
}

object GraftExtensions {

  private val jaccardSorted = (
    new FunctionIdentifier("jaccard_sorted"),
    new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "jaccard_sorted(a, b) takes two array<long> args")
      JaccardSorted(children.head, children(1))
    })

  private val cosineSim = (
    new FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_sim(a, b) takes two numeric-array args")
      CosineSim(children.head, children(1))
    })

  private val intersectSorted = (
    new FunctionIdentifier("intersect_sorted"),
    new ExpressionInfo(classOf[IntersectSorted].getName, "intersect_sorted"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "intersect_sorted(a, b) takes two array<long> args")
      IntersectSorted(children.head, children(1))
    })

  private val topKBy = (
    new FunctionIdentifier("top_k_by"),
    new ExpressionInfo(classOf[TopKBy].getName, null, "top_k_by",
      "top_k_by(score, id, k) - top-k (score, id) pairs per group, " +
        "best-first, ties -> smallest id. Rows with NULL score or id " +
        "are SKIPPED (aggregate null semantics, unlike a row_number " +
        "window which ranks NULL scores) - coalesce to a sentinel for " +
        "window parity.",
      "", "", "", "agg_funcs", "", "", ""),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "top_k_by(score, id, k) takes two bigint args and a literal int k")
      TopKBy(children.head, children(1), children(2))
    })

  /** Register on an existing session (same builder the extension injects). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      jaccardSorted._1, jaccardSorted._2, jaccardSorted._3)
    spark.sessionState.functionRegistry.registerFunction(
      cosineSim._1, cosineSim._2, cosineSim._3)
    spark.sessionState.functionRegistry.registerFunction(
      intersectSorted._1, intersectSorted._2, intersectSorted._3)
    spark.sessionState.functionRegistry.registerFunction(
      topKBy._1, topKBy._2, topKBy._3)
  }
}
