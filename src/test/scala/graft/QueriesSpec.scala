package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs on sf0.001 and yields rows; every
  * oracle key refers to a real query. The value-level check against
  * DuckDB is the driver's job (graft.Verify + oracle_sql.json).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("oracle keys are a subset of query keys") {
    val missing = Queries.oracle.keySet.diff(Queries.all.keySet)
    assert(missing.isEmpty, s"oracle entries without query impl: $missing")
  }

  Queries.all.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows on sf0.001") {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns clusters") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("d_minhash_cluster groups exact and near dups, separates unrelated") {
    import spark.implicits._
    val base = "The quick brown fox jumps over the lazy dog. " * 8
    val near = base.replace("lazy dog", "idle dog")
    val other = "Entirely different content about spark shuffles. " * 8
    val tmp = java.nio.file.Files.createTempDirectory("mhc").toString
    Seq((0L, base), (1L, base), (2L, near), (3L, other))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Queries.dMinhashCluster(spark, tmp)
      .as[(Long, Long)].collect().toMap
    assert(got(0L) === got(1L), "exact dups must share a cluster")
    assert(got(0L) === got(2L), "near dup (1-word edit) must join the cluster")
    assert(got(3L) !== got(0L), "unrelated doc must stay out")
    assert(got.size === 4)
  }

  test("d_simhash_md5 ranks exact dups at hamming 0, keeps unrelated out") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    // ONE occurrence changed out of 60 words: word-granularity SimHash is
    // coarse, so a sweeping edit (all 5 "lazy"s) legitimately exceeds the
    // radius — verified hamming for this edit is 2
    val near = base.replaceFirst("lazy dog", "lazy cat")
    val other = ("completely different shuffle partition spill broadcast " +
      "codegen catalyst tungsten executor ") * 5
    val tmp = java.nio.file.Files.createTempDirectory("shm").toString
    Seq((0L, base), (1L, base), (2L, near), (3L, other))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Queries.dSimhashMd5(spark, tmp)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(got((0L, 1L)) === 0L, "identical docs must pair at hamming 0")
    assert(got.get((0L, 2L)).exists(_ <= 3L),
      "one-word edit must stay within the radius")
    assert(!got.keySet.exists { case (a, b) => (a min b, a max b) match {
      case (x, 3L) => x != 3L
      case _ => false
    }}, "unrelated doc must not pair")
  }

  test("d_winnow: shared >=11-cp substring guarantees a shared fingerprint") {
    import spark.implicits._
    val common = "thequickbrownfox" // 16 cp >= w + gram - 1 = 11
    val a = "aaaa bbbb cccc " + common + " dddd eeee"
    val b = "zzzz yyyy xxxx " + common + " wwww vvvv"
    val c = "0123456789 completely disjoint text 9876543210"
    val tmp = java.nio.file.Files.createTempDirectory("win").toString
    Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fps = Queries.dWinnow(spark, tmp)
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (d, r) => d -> r.map(_._2).toSet }
    assert(fps(0L).intersect(fps(1L)).nonEmpty,
      "winnowing guarantee: window+gram-1 shared cps => shared fp")
    // no shared 8-gram with doc c => fingerprint sets cannot intersect
    assert(fps(0L).intersect(fps(2L)).isEmpty)
  }

  test("d_curation partitions every doc into exactly one bucket") {
    import spark.implicits._
    val good = "spark shuffle partition " * 10 // 240 chars, 25% spaces
    val tmp = java.nio.file.Files.createTempDirectory("cur").toString
    Seq(
      (0L, "en", "s0", good),            // kept (first writer of good)
      (1L, "en", "s0", good),            // exact dup of 0 -> drop_dup
      (2L, "en", "s1", good),            // exact dup of 0 -> drop_dup
      (3L, "en", "s0", "short"),         // quality: too short
      (4L, "fr", "s1", "x".repeat(200)), // quality: no spaces
      (5L, "fr", "s1", good + "tail"))   // kept (distinct text)
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Queries.dCuration(spark, tmp)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map { case (l, s, d, dq, dd, k) => (l, s) -> ((d, dq, dd, k)) }.toMap
    assert(rows(("en", "s0")) === ((3L, 1L, 1L, 1L)))
    assert(rows(("en", "s1")) === ((1L, 0L, 1L, 0L)))
    assert(rows(("fr", "s1")) === ((2L, 1L, 0L, 1L)))
    rows.values.foreach { case (docs, dq, dd, k) =>
      assert(docs === dq + dd + k, "every doc lands in exactly one bucket")
    }
  }
}
