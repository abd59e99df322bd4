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

  test("banded sign-LSH dedup finds every brute-force dup pair (recall 1.0)") {
    // 30 base vectors with ±0.5 components + a near-dup of each perturbed
    // by ≤0.1 (no sign flips ⇒ identical buckets in every band, cosine
    // ≈ 0.99), plus unrelated vectors. LSH candidates must contain every
    // true dup pair, so lshDedup's is_dup output == brute force's.
    val rng = new scala.util.Random(7)
    val dim = 64
    def base(): Array[Float] =
      Array.fill(dim)(if (rng.nextBoolean()) 0.5f else -0.5f)
    val rows = (0 until 30).flatMap { i =>
      val b = base()
      val dup = b.map(x => x + (rng.nextFloat() - 0.5f) * 0.2f * math.signum(x))
      Seq((i.toLong * 2, b, 0), (i.toLong * 2 + 1, dup, 0))
    } ++ (100 until 140).map(i => (i.toLong, base(), 1))
    val df = rows.toDF("vec_id", "embedding", "label")

    // brute-force truth: all pairs with cosine >= 0.95
    val all = rows.map(r => (r._1, r._2))
    val truth = (for {
      (a, va) <- all; (b, vb) <- all if a < b
      if Similarity.cosine(va, vb) >= 0.95
    } yield (a, b)).toSet

    val out = Similarity.lshDedup(df, tau = 0.95)
      .filter($"is_dup").select($"vec_id", $"nearest")
      .as[(Long, Long)].collect()
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    assert(truth.nonEmpty)
    assert(truth === out,
      s"missing=${truth.diff(out)} extra=${out.diff(truth)}")
  }

  test("lshDedup hub-star keeps mega-buckets linear but linked") {
    // 200 identical vectors: every band bucket is hot (> maxBucket=64);
    // hub-star yields n-1 pairs through the min id instead of n² or zero
    val v = Array.fill(64)(0.5f)
    val df = (0 until 200).map(i => (i.toLong, v, 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.lshDedup(df).filter($"is_dup")
      .select($"vec_id", $"nearest").as[(Long, Long)].collect()
    // every non-hub vector reports the hub (id 0) as its nearest dup, and
    // the hub reports its smallest spoke — one row per vector, all via hub
    assert(out.length === 200)
    assert(out.forall(p => p._1 == 0L || p._2 == 0L))
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
