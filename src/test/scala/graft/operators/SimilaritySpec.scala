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

  test("IVF with k-means centroids is still lossless at full probe") {
    val ivf = Similarity.ivfTopK(emb, queryMaxId = 10, nlist = 8, nProbe = 8,
        k = 5, kmeansIters = 5)
      .select($"query_id", $"neighbor_id", $"rk").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
      .map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }
    assert(ivf === bruteTopK(5, 10))
  }

  test("k-means centroids rescue partial-probe recall on a CLUSTERED corpus") {
    // ids 0-15 (the raw centroid seeds) are NEAR-IDENTICAL duplicates —
    // the classic dedup-corpus skew — so seed-centroid routing is pure
    // jitter noise: each group's members scatter across all 16 lists
    // decorrelated from where its queries probe. Lloyd rounds pull the
    // centroids apart onto the real direction-groups.
    val dim = 16
    val perGroup = 60
    // hash-based jitter: structured (arithmetic-progression) jitter makes
    // every vector rank the centroids identically, which silently re-forms
    // coherent routing — xxhash decorrelates it
    def jit(id: Int, i: Int, amp: Double): Double =
      amp * ((graft.functions.Hash64.hashLong(id.toLong * dim + i, 0x5eedL) & 0xffff) / 65536.0)
    // seeds vary ONLY on axes 9-15 (never on a group axis): any
    // centroid-side variation along a group axis re-creates coherent
    // routing for that group; with it zeroed, seed routing is pure
    // query-side noise, decorrelated from the group structure
    val seeds = (0 until 16).map { id =>
      (id.toLong, Array.tabulate(dim)(i =>
        ((if (i == 0) 50.0 else 0.0) + (if (i >= 9) jit(id, i, 0.05) else 0.0)).toFloat))
    }
    val grouped = (16 until 16 + 8 * perGroup).map { id =>
      val g = 1 + (id - 16) / perGroup // axes 1..8
      (id.toLong, Array.tabulate(dim)(i =>
        ((if (i == g) 50.0 else 0.0) + jit(id, i, 3.0)).toFloat))
    }
    val vecs = seeds ++ grouped
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map { case (id, e) =>
        org.apache.spark.sql.Row(id, e, 0) }, 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.IntegerType))))
    val all = vecs.toArray
    val queries = (0 until 8).map(g => all(16 + g * perGroup)) // one per group
    val truth = queries.map { case (qid, q) =>
      qid -> all.filter(_._1 != qid)
        .map { case (id, e) => (id, Similarity.cosine(q, e)) }
        .sortBy(x => (-x._2, x._1)).take(5).map(_._1).toSet
    }.toMap
    def recall(kmeansIters: Int): Double = {
      val cents = if (kmeansIters > 0) Similarity.kmeansCentroids(df, 16, kmeansIters)
        else Similarity.centroids(df, 16)
      val assigned = Similarity.assign(df, cents)
        .select($"vec_id", $"embedding", $"listId")
        .as[(Long, Array[Float], Int)].collect()
      val byList = assigned.groupBy(_._3)
      val centArr = cents.map(_._2)
      queries.map { case (qid, q) =>
        val probe = centArr.indices
          .map(i => (i, Similarity.cosine(q, centArr(i))))
          .sortBy(x => (-x._2, x._1)).take(2).map(_._1)
        val got = probe.flatMap(byList.getOrElse(_, Array.empty))
          .filter(_._1 != qid)
          .map { case (id, e, _) => (id, Similarity.cosine(q, e)) }
          .sortBy(x => (-x._2, x._1)).take(5).map(_._1).toSet
        got.intersect(truth(qid)).size / 5.0
      }.sum / queries.size
    }
    val seedRecall = recall(0)
    val kmRecall = recall(5)
    info(f"clustered-corpus recall@5, nProbe=2/16: seeds=$seedRecall%.3f kmeans=$kmRecall%.3f")
    assert(kmRecall > seedRecall,
      f"k-means ($kmRecall%.2f) should beat seed centroids ($seedRecall%.2f)")
    assert(kmRecall >= 0.9, f"k-means should recover group neighbors, got $kmRecall%.2f")
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

  test("PQ ANN: m-byte codes, deterministic codebooks, ADC+rerank keeps recall") {
    // uniform random vectors are PQ's WORST case (no cluster structure to
    // quantize onto); measured here: 0.54/0.73/0.93 recall at refine
    // 4/8/16 — the driver query ships refine=16
    val pq = Similarity.pqTopK(emb, queryMaxId = 20, m = 8, k = 16, topK = 5,
        refine = 16)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    val brute = bruteTopK(5, 20).map { case (q, r) => q -> r.toSet }
    val recall = brute.map { case (q, truth) =>
      pq.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }.sum / brute.size
    info(f"PQ recall@5 (m=8, k=16, refine 16x): $recall%.3f")
    assert(recall >= 0.8, f"PQ recall $recall too low")
    // codes really are m ints per vector; codebooks deterministic
    val books = Similarity.pqTrain(emb, 8, 16)
    assert(books.length == 8)
    books.foreach(b => assert(b.length <= 16))
    val codes = Similarity.pqEncode(emb, books)
    assert(codes.select(size($"codes")).as[Int].collect().forall(_ == 8))
    val again = Similarity.pqTrain(emb, 8, 16)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq ==
      again.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("PQ ANN: query batching is result-invariant (queryMaxId >> batch size)") {
    // 200 queries at queryBatch=16 -> 13 scan passes; results must equal
    // the single-pass formulation exactly (no caller can hit an
    // O(corpus x all-queries) pass, and batching costs no recall)
    def res(batch: Int) = Similarity.pqTopK(emb, queryMaxId = 200,
        m = 8, k = 16, topK = 5, refine = 4, queryBatch = batch)
      .select($"query_id", $"neighbor_id", $"rk").as[(Long, Long, Long)]
      .collect().toSet
    val batched = res(16)
    assert(batched.size == 200 * 5)
    assert(batched === res(100000))
  }

  test("integer PQ (engine-exact twin): recall vs exact integer IP, partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqAdcTopK(df, queryMaxId = 20, m = 8, k = 64, trainN = 500,
          iters = 3, topK = 5, refine = 8)
        .select($"query_id", $"neighbor_id", $"rk", $"exact_ip")
        .as[(Long, Long, Long, Long)].collect().toSet
    val base = run(emb)
    assert(base.size === 20 * 5)
    // exact integer-IP brute force over the same micro quantization
    val micro = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => java.math.BigDecimal.valueOf(x.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
      }
    def ip(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val truth = micro.filter(_._1 < 20).map { case (qid, q) =>
      qid -> micro.filter(_._1 != qid)
        .map { case (id, v) => (id, ip(q, v)) }
        .sortBy(x => (-x._2, x._1)).take(5).map(_._1).toSet
    }.toMap
    val got = base.groupBy(_._1).map { case (q, r) => q -> r.map(_._2) }
    val recall = truth.map { case (q, ts) =>
      got.getOrElse(q, Set.empty).intersect(ts).size.toDouble / ts.size
    }.sum / truth.size
    info(f"integer-PQ recall@5 (m=8, k=64, refine 8x): $recall%.3f")
    assert(recall >= 0.8, f"integer-PQ recall $recall too low")
    // heap tie-handling is partition-independent: any input layout gives
    // the identical (ip DESC, id ASC) result set
    assert(run(emb.repartition(17)) === base)
    assert(run(emb.repartition(1)) === base)
  }

  test("integer PQ: query batching is result-invariant (queryMaxId >> batch size)") {
    // 60 queries at queryBatch=7 -> 9 scan passes over the persisted
    // codes; the engine-exact arithmetic means the batched result must
    // equal the single-pass formulation EXACTLY, row for row
    def res(batch: Int) = Similarity.pqAdcTopK(emb, queryMaxId = 60,
        m = 8, k = 64, trainN = 500, iters = 3, topK = 5, refine = 8,
        queryBatch = batch)
      .select($"query_id", $"neighbor_id", $"rk", $"exact_ip")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batched = res(7)
    assert(batched.size == 60 * 5)
    assert(batched === res(100000))
  }

  test("int8 quantization: codes span the range, dequantized ANN keeps recall") {
    val (codes, stats) = Similarity.quantize(emb)
    val dim = emb.select(size($"embedding")).as[Int].head()
    assert(codes.select(size($"codes")).as[Int].collect().forall(_ == dim))
    val st = stats.as[(Long, Double, Double)].collect()
    assert(st.length === dim)
    st.foreach { case (_, lo, hi) => assert(lo <= hi) }
    // dequantized top-5 vs exact top-5: int8 error is ~0.2% of each dim's
    // range, so neighbor ranking should be nearly unchanged
    val deq = Similarity.dequantized(emb)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val exact = bruteTopK(5, 20)
    val deqTop = deq.filter(_._1 < 20).map { case (qid, q) =>
      qid -> deq.filter(_._1 != qid)
        .map { case (id, v) => (id, Similarity.cosine(q, v)) }
        .sortBy(x => (-x._2, x._1)).take(5).map(_._1).toSet
    }.toMap
    val recall = exact.map { case (q, truth) =>
      deqTop(q).intersect(truth.toSet).size.toDouble / truth.size
    }.sum / exact.size
    info(f"quantized recall@5: $recall%.3f")
    assert(recall >= 0.9, f"int8 quantization recall $recall too low")
  }

  test("int8 quantization: codes in [0,255], error bounded by half a step") {
    val (codes, stats) = Similarity.quantize(emb)
    val span = stats.as[(Long, Double, Double)].collect()
      .map { case (d, lo, hi) => d.toInt -> (hi - lo) }.toMap
    val orig = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    codes.select($"codes").as[Seq[Int]].collect()
      .foreach(_.foreach(q => assert(q >= 0 && q <= 255, s"code $q out of range")))
    // per-element reconstruction error ≤ step/2 (+ float slack)
    val deq = Similarity.dequantized(emb)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    orig.foreach { case (id, x) =>
      val y = deq(id)
      x.indices.foreach { d =>
        val tol = span(d) / 510.0 + 1e-4
        assert(math.abs(x(d) - y(d)) <= tol,
          s"vec $id dim $d err ${math.abs(x(d) - y(d))} > $tol")
      }
    }
  }

  test("semDedup: exact driver-side replay + kept-set retention invariant") {
    // different nlist/iters than the driver query (e_semdedup runs 16/5)
    // so the parameterization is covered, not just the oracled point
    val (nlist, iters, tau) = (8, 3, 0.30)
    val out = Similarity.semDedup(emb, nlist, iters, tau)
      .select($"vec_id", $"list_id", $"kept").as[(Long, Long, Boolean)]
      .collect()
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    assert(out.length === vecs.size)
    val dropped = out.filter(!_._3).map(_._1).toSet
    assert(dropped.nonEmpty, "tau never fired — duel path untested")
    assert(dropped.size < vecs.size, "everything dropped")

    // full replay: same centroids, first-index-wins argmax assignment,
    // per-pair victim rule (closer-to-centroid loses, ties drop max id)
    val cents = Similarity.kmeansCentroids(emb, nlist, iters)
    val asg = vecs.map { case (id, v) =>
      var best = 0; var bestCos = Double.MinValue
      cents.indices.foreach { i =>
        val cs = Similarity.cosine(v, cents(i)._2)
        if (cs > bestCos) { bestCos = cs; best = i }
      }
      (id, best, bestCos)
    }.toSeq
    assert(out.map(r => r._1 -> r._2).toMap ===
      asg.map(a => a._1 -> a._2.toLong).toMap)
    val expectVict = asg.groupBy(_._2).values.flatMap { ms =>
      val s = ms.toArray.sortBy(_._1)
      for {
        i <- s.indices; j <- (i + 1) until s.length
        if Similarity.cosine(vecs(s(i)._1), vecs(s(j)._1)) >= tau
      } yield if (s(i)._3 > s(j)._3) s(i)._1
        else if (s(j)._3 > s(i)._3) s(j)._1
        else math.max(s(i)._1, s(j)._1)
    }.toSet
    assert(dropped === expectVict)

    // retention invariant: the kept set holds no intra-cluster pair ≥ tau
    out.filter(_._3).groupBy(_._2).values.foreach { ms =>
      val ids = ms.map(_._1)
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        assert(Similarity.cosine(vecs(ids(i)), vecs(ids(j))) < tau,
          s"kept pair ${ids(i)},${ids(j)} above tau")
    }
  }

  test("semDedup maxList cap: one mega-cluster stays linear, rim kept") {
    // ONE fully-connected near-dup cluster (the SemDeDup worst case a
    // near-dup-heavy corpus produces): n copies of a base vector with a
    // tiny deterministic jitter so centroid similarities are distinct.
    // Under the uncapped all-pairs rule a fully-connected ≥tau cluster
    // keeps exactly its min-(csim, id) member; the hub-star cap must
    // reproduce that verdict with O(n) duels.
    val n = 64
    val mega = spark.createDataset((0 until n).map { i =>
      val v = Array.tabulate(8)(d =>
        (if (d == 0) 1f else 0f) + (if (d == 1) i * 1e-4f else 0f))
      (i.toLong, v, i % 2)
    }).toDF("vec_id", "embedding", "label")
    val uncapped = Similarity.semDedup(mega, nlist = 2, iters = 2, tau = 0.9)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    val capped = Similarity.semDedup(mega, nlist = 2, iters = 2, tau = 0.9,
        maxList = 8) // well below n: the hub-star arm MUST fire
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(capped.count(_._2) >= 1, "cap dropped everything")
    assert(capped.count(!_._2) >= n - 2, "cap fired no duels")
    // fully-connected cluster: capped and uncapped keep the same rim set
    assert(capped === uncapped,
      "hub-star cap diverged from all-pairs on a fully-connected cluster")
  }
}
