package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // one hub key carrying 50k rows (a mega-bucket's star edges) + a long
  // cold tail, joined against a one-row-per-key lookup
  private def skewed() = {
    val big = spark.range(50000).select(lit(7L).as("k"), col("id").as("payload"))
      .unionByName(spark.range(2000).select((col("id") + 100).as("k"), col("id").as("payload")))
    val lookup = spark.range(2200).select(col("id").as("k"),
      concat(lit("sig"), col("id")).as("sig"))
    (big, lookup)
  }

  test("hot-key split join returns exactly the plain join's rows") {
    val (big, lookup) = skewed()
    val plain = big.join(lookup, Seq("k"))
      .select($"k", $"payload", $"sig").as[(Long, Long, String)].collect().sorted
    val split = SkewJoin.lookupJoin(big, lookup, "k", hotThreshold = 1000)
      .select($"k", $"payload", $"sig").as[(Long, Long, String)].collect().sorted
    assert(split.length === plain.length)
    assert(split === plain)
  }

  test("hot rows go through a broadcast join, never a shuffle") {
    val (big, lookup) = skewed()
    val out = SkewJoin.lookupJoin(big, lookup, "k", hotThreshold = 1000)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast branch in:\n$plan")
    // the hot branch's broadcast must carry only the hot keys' lookup rows
    // (a semi-joined subset), not the whole lookup table
    assert(plan.contains("LeftSemi") || plan.contains("left_semi"),
      s"hot lookup subset not semi-filtered in:\n$plan")
  }

  test("threshold above every key count degrades to one plain join") {
    val (big, lookup) = skewed()
    val out = SkewJoin.lookupJoin(big, lookup, "k", hotThreshold = 1000000)
    assert(out.count() === 52000)
  }

  test("verifiedPairs survives a hub with every spoke on one key") {
    import graft.pipeline._
    // 1 hub (fileId 0) starred to 5k spokes, all with identical shingles →
    // every pair verifies at jaccard 1.0 through the hot-key path
    val sh = Array(1L, 2L, 3L, 4L)
    val sigs = spark.createDataset(
      (0 until 5001).map(i => FileSig(i.toLong, s"sha$i", sh, Array(9L, 9L))))(
      org.apache.spark.sql.Encoders.product[FileSig])
    val pairs = spark.range(1, 5001).select(lit(0L).as("a"), col("id").as("b"))
    val out = DedupPipeline.verifiedPairs(pairs, sigs, DedupConfig(),
      hotKeyThreshold = 100)
    assert(out.count() === 5000)
    assert(out.agg(min($"jaccard")).head().getDouble(0) === 1.0)
  }
}
