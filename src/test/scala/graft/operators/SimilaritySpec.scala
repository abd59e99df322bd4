package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def bruteTopK(k: Int, maxQ: Long): Map[Long, Seq[Long]] = {
    val all = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    all.filter(_._1 < maxQ).map { case (qid, q) =>
      qid -> all.filter(_._1 != qid)
        .map { case (id, v) => (id, Similarity.cosine(q, v)) }
        .sortBy(x => (-x._2, x._1)).take(k).map(_._1).toSeq
    }.toMap
  }

  test("IVF with full probing equals brute force") {
    val ivf = Similarity.ivfTopK(emb, queryMaxId = 10, nlist = 8, nProbe = 8, k = 5)
      .select($"query_id", $"neighbor_id", $"rk").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
      .map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }
    val brute = bruteTopK(5, 10)
    assert(ivf === brute)
  }

  test("IVF with partial probing keeps useful recall at a fraction of the work") {
    val ivf = Similarity.ivfTopK(emb, queryMaxId = 20, nlist = 16, nProbe = 4, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    val brute = bruteTopK(5, 20).map { case (q, r) => q -> r.toSet }
    val recall = brute.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }.sum / brute.size
    info(f"IVF recall@5 with nProbe=4/16: $recall%.3f")
    assert(recall >= 0.5, f"recall $recall too low")
  }
}
