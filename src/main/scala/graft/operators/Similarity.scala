package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbour over embedding columns.
  *
  * Brute-force cosine top-k is the baseline (Queries.eAnnTopK); this is
  * the scale path: IVF — deterministic coarse quantizer (first `nlist`
  * vectors by id serve as centroids), inverted lists per centroid, probe
  * the `nProbe` nearest lists per query. Candidate set shrinks by
  * ~nProbe/nlist versus brute force; the exact-cosine rerank stays.
  */
object Similarity {

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
  def cosine(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic centroids: the nlist lowest vec_ids (a real system
    * would k-means; determinism matters more here than centroid quality).
    */
  def centroids(embeddings: DataFrame, nlist: Int): Array[(Long, Array[Float])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .orderBy(col("vec_id")).limit(nlist).collect()
  }

  /** Inverted-list assignment: each vector to its max-cosine centroid. */
  def assign(embeddings: DataFrame, cents: Array[(Long, Array[Float])]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    embeddings.select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) =>
        val c = bc.value
        var best = 0; var bestCos = Double.MinValue
        var i = 0
        while (i < c.length) {
          val cs = cosine(emb, c(i)._2)
          if (cs > bestCos) { bestCos = cs; best = i }
          i += 1
        }
        (id, emb, label, best)
      }
      .toDF("vec_id", "embedding", "label", "listId")
  }

  /** IVF top-k: probe the nProbe nearest lists per query, exact-cosine
    * rerank inside the probed candidates. One shuffle on listId.
    */
  def ivfTopK(embeddings: DataFrame, queryMaxId: Long, nlist: Int,
      nProbe: Int, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = centroids(embeddings, nlist)
    val assigned = assign(embeddings, cents).persist()
    val bc = spark.sparkContext.broadcast(cents)
    val queries = assigned.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, q) =>
        val c = bc.value
        c.indices.map(i => (i, cosine(q, c(i)._2)))
          .sortBy(x => (-x._2, x._1)).take(nProbe)
          .iterator.map { case (listId, _) => (qid, q, listId) }
      }
      .toDF("query_id", "q", "listId")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val cosUdf = udf((a: Seq[Float], b: Seq[Float]) =>
      cosine(a.toArray, b.toArray))
    val out = queries
      .join(assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("v"), col("listId")), Seq("listId"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosUdf(col("q"), col("v")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        round(col("cos"), 4).as("cosine_r"))
      .localCheckpoint(true) // materialize (small: k rows/query) → free cache
    assigned.unpersist()
    out
  }
}
