package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("jaccard_sorted is callable from SQL after registration") {
    // the spark-submit path injects via spark.sql.extensions; on a live
    // session the same builder registers directly
    new GraftExtensions() // the extension class itself must instantiate
    GraftExtensions.register(spark)
    import spark.implicits._
    val j = spark.sql(
      "SELECT jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
      .as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12) // |{2,3}| / |{1,2,3,4}|
    val empty = spark.sql(
      "SELECT jaccard_sorted(array(1L), CAST(array() AS array<bigint>)) AS j")
      .as[Double].head()
    assert(empty === 0.0)
    // wrong arity fails at analysis, not at runtime
    intercept[Exception](spark.sql("SELECT jaccard_sorted(array(1L))").collect())
  }

  test("intersect_sorted: set and multiset merge counts, SQL-callable") {
    GraftExtensions.register(spark)
    import spark.implicits._
    def n(sql: String): Long = spark.sql(s"SELECT $sql AS n").as[Long].head()
    assert(n("intersect_sorted(array(1L,2L,3L), array(2L,3L,4L))") === 2L)
    assert(n("intersect_sorted(array(1L), CAST(array() AS array<bigint>))") === 0L)
    // sorted-with-duplicates inputs count multiset overlap min(c_a, c_b)
    assert(n("intersect_sorted(array(1L,1L,1L,2L), array(1L,1L,2L,2L))") === 3L)
    // randomized parity vs a Scala-side merge over sorted arrays
    val rnd = new scala.util.Random(9)
    val pairs = Seq.fill(50)((
      Array.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted,
      Array.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted))
    val got = pairs.toDF("a", "b")
      .select(graft.functions.IntersectSorted(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("n"))
      .as[Long].collect()
    pairs.zip(got).foreach { case ((a, b), g) =>
      val exp = a.groupBy(identity).map { case (k, v) =>
        math.min(v.length, b.count(_ == k)) }.sum.toLong
      assert(g === exp)
    }
    intercept[Exception](spark.sql("SELECT intersect_sorted(array(1L))").collect())
  }

  test("intersect_sorted_pairs: unsigned 128-bit merge counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // md5s are 128-bit UNSIGNED values packed as (hi, lo) long pairs:
    // high-bit-set longs are NEGATIVE signed, so a signed merge scan
    // would mis-order them — pin the unsigned compare on both limbs
    def pack(ps: (Long, Long)*): Array[Long] = ps.flatMap(p => Seq(p._1, p._2)).toArray
    val hi = java.lang.Long.parseUnsignedLong("ffffffffffffffff", 16)
    val cases = Seq(
      // unsigned order: (1,5) < (1,hi) < (hi,2) < (hi,hi)
      (pack((1L, 5L), (1L, hi), (hi, 2L)), pack((1L, hi), (hi, 2L), (hi, hi)), 2L),
      // same hi limb, lo limbs differ only in sign bit
      (pack((3L, 1L), (3L, hi)), pack((3L, hi)), 1L),
      (pack((1L, 1L)), Array.empty[Long], 0L),
      // equal pairs count once each; (2,2) on one side only
      (pack((1L, 1L), (2L, 2L), (hi, 0L)), pack((1L, 1L), (hi, 0L)), 2L))
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(graft.functions.IntersectSortedPairs(col("a"), col("b")).as("n"))
      .as[Long].collect()
    assert(got.toSeq === cases.map(_._3))
    // randomized parity vs a Scala-side set intersection of (hi, lo)
    // tuples, sorted unsigned exactly like RepoDedup.forkPairs packs them
    val rnd = new scala.util.Random(11)
    def rndSet(): Array[(Long, Long)] = {
      val s = Set.fill(rnd.nextInt(30))((rnd.nextLong() % 4, rnd.nextLong() % 4))
      s.toArray.sortWith { (x, y) =>
        val c = java.lang.Long.compareUnsigned(x._1, y._1)
        if (c != 0) c < 0 else java.lang.Long.compareUnsigned(x._2, y._2) < 0
      }
    }
    val rpairs = Seq.fill(40)((rndSet(), rndSet()))
    val rgot = rpairs.map { case (a, b) => (pack(a.toSeq: _*), pack(b.toSeq: _*)) }
      .toDF("a", "b")
      .select(graft.functions.IntersectSortedPairs(col("a"), col("b")).as("n"))
      .as[Long].collect()
    rpairs.zip(rgot).foreach { case ((a, b), g) =>
      assert(g === a.toSet.intersect(b.toSet).size.toLong)
    }
  }

  test("cosine_sim matches the scalar implementation and is SQL-callable") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(20)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val pairs = df.as("a").join(df.as("b"),
        org.apache.spark.sql.functions.col("a.id") <
          org.apache.spark.sql.functions.col("b.id"))
      .select(org.apache.spark.sql.functions.col("a.id").as("i"),
        org.apache.spark.sql.functions.col("b.id").as("j"),
        graft.functions.CosineSim(
          org.apache.spark.sql.functions.col("a.v"),
          org.apache.spark.sql.functions.col("b.v")).as("c"))
      .as[(Long, Long, Double)].collect()
    assert(pairs.length === 190)
    pairs.foreach { case (i, j, c) =>
      val exp = graft.operators.Similarity.cosine(vecs(i.toInt), vecs(j.toInt))
      assert(math.abs(c - exp) < 1e-12, s"pair ($i,$j)")
    }
    // SQL path, double arrays, self-similarity = 1
    val one = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(1.0D, 2.0D)) AS c")
      .as[Double].head()
    assert(math.abs(one - 1.0) < 1e-12)
    intercept[Exception](spark.sql("SELECT cosine_sim(array(1.0D))").collect())
    // mixed float/double sides are rejected at analysis, not mis-scanned
    intercept[Exception](spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(1.0D))").collect())
    // mismatched lengths and null elements yield NULL (like the HOF
    // formulation this replaced), never a silently-wrong finite score
    assert(spark.sql(
      "SELECT cosine_sim(array(1.0D), array(1.0D, 2.0D)) AS c")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS c")
      .head().isNullAt(0))
  }

  test("top_k_by: window-rank parity, partition invariance, window-free plan") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // hot group 0 (2000 rows incl. score ties), cold tail, singleton group
    val rows = Seq.tabulate(2000)(i => (0L, rnd.nextInt(40).toLong, i.toLong)) ++
      Seq.tabulate(300)(i => ((1 + i % 17).toLong, rnd.nextInt(900).toLong, (10000 + i).toLong)) :+
      ((99L, 5L, 777L))
    val k = 5
    def run(nPart: Int) = rows.toDF("g", "score", "id").repartition(nPart)
      .groupBy($"g")
      .agg(graft.functions.TopKBy($"score", $"id", k).as("topk"))
      .select($"g", posexplode($"topk"))
      .select($"g", $"col.score".as("score"), $"col.id".as("id"),
        ($"pos" + 1).cast("long").as("rk"))
    val expected = rows.toDF("g", "score", "id")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"score".desc, $"id")).cast("long"))
      .filter($"rk" <= k)
      .select($"g", $"score", $"id", $"rk")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    for (nPart <- Seq(1, 7, 32)) {
      val got = run(nPart).as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(got === expected, s"nPart=$nPart")
    }
    // the aggregate plan has no window/sort operator — partial heaps
    // combine map-side (ObjectHashAggregate), nothing globally sorted
    val plan = run(32).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert(!plan.contains("Window"), "top_k_by plan must be window-free")
    // SQL-callable and analysis-time validation of k
    val viaSql = spark.sql(
      "SELECT top_k_by(s, i, 2) AS t FROM VALUES (3L, 1L), (3L, 0L), (9L, 4L) AS v(s, i)")
      .selectExpr("t[0].id", "t[0].score", "t[1].id", "t[1].score")
      .as[(Long, Long, Long, Long)].head()
    assert(viaSql === ((4L, 9L, 0L, 3L))) // ties → smaller id first
    intercept[Exception](spark.sql("SELECT top_k_by(1L, 2L)").collect())
    intercept[Exception](
      spark.sql("SELECT top_k_by(s, i, 0) FROM VALUES (1L, 1L) AS v(s, i)").collect())
    intercept[Exception]( // non-literal k rejected at analysis
      spark.sql("SELECT top_k_by(s, i, CAST(i AS INT)) FROM VALUES (1L, 1L) AS v(s, i)").collect())
  }
}
