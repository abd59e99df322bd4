package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class RestoreSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def recipe(cids: Long*) =
    cids.zipWithIndex.map { case (c, i) => ("s", i.toLong, 1024 * 1024, c) }
      .toDF("stream", "seq", "size", "containerId")

  test("LRU simulation counts reads exactly") {
    // cache size 2, accesses: 1 2 1 3 2 → reads: 1,2,hit(1),3 evict 2...
    // LRU order after [1,2,1]: {2,1}; access 3: evict 2 → {1,3}; access 2: miss
    val r = recipe(1, 2, 1, 3, 2)
    val s = RestoreSim.simulate(r, cacheSize = 2, policy = "lru").collect().head
    assert(s.chunks === 5)
    assert(s.containerReads === 4)
    assert(s.speedFactor === 5.0 / 4.0)
  }

  test("OPT (Belady) never does worse than LRU") {
    // adversarial for LRU with cache 2: 1 2 3 1 2 3 ...
    val seq = (0 until 30).map(i => (i % 3 + 1).toLong)
    val r = recipe(seq: _*)
    val lru = RestoreSim.simulate(r, 2, "lru").collect().head
    val opt = RestoreSim.simulate(r, 2, "opt").collect().head
    assert(lru.containerReads === 30) // classic LRU thrash
    assert(opt.containerReads < lru.containerReads)
  }

  test("OPT lookahead window bounds memory; small window degrades gracefully") {
    // Belady on 1 2 3 1 2 3 ... with cache 2: full lookahead reads 3 +
    // one miss per period boundary; a lookahead that covers the whole
    // stream must equal the default, and a tiny window stays between
    // full-OPT and LRU (it can only lose foresight, not correctness)
    val seq = (0 until 30).map(i => (i % 3 + 1).toLong)
    val r = recipe(seq: _*)
    val full = RestoreSim.simulate(r, 2, "opt").collect().head
    val covering = RestoreSim.simulate(r, 2, "opt", optLookahead = 64).collect().head
    val tiny = RestoreSim.simulate(r, 2, "opt", optLookahead = 3).collect().head
    val lru = RestoreSim.simulate(r, 2, "lru").collect().head
    assert(covering.containerReads === full.containerReads)
    assert(tiny.containerReads >= full.containerReads)
    assert(tiny.containerReads <= lru.containerReads)
    assert(tiny.chunks === 30 && tiny.bytes === full.bytes)
  }

  test("CFL equals optimal/actual container reads") {
    // 4 chunks of 1 MiB in one container: optimal = ceil(4MiB/4MiB)=1 read
    val r = recipe(1, 1, 1, 1)
    val s = RestoreSim.simulate(r, 128, "lru").collect().head
    assert(s.containerReads === 1)
    assert(s.cfl === 1.0)
  }

  test("ASM forward assembly reads each container once per area") {
    // cache 2 → area = 4 MiB = 4 chunks of 1 MiB
    // accesses 1 2 1 2 | 3 1 → area1 reads {1,2}=2, area2 reads {3,1}=2
    val r = recipe(1, 2, 1, 2, 3, 1)
    val s = RestoreSim.simulate(r, cacheSize = 2, policy = "asm").collect().head
    assert(s.containerReads === 4)
    // a huge area covers everything: reads = distinct containers
    val s2 = RestoreSim.simulate(r, cacheSize = 128, policy = "asm").collect().head
    assert(s2.containerReads === 3)
  }

  test("access records run-length encode container ids") {
    val r = recipe(1, 1, 2, 2, 1)
    val recs = RestoreSim.accessRecords(r)
      .select($"containerId").as[Long].collect()
    assert(recs.toSeq === Seq(1L, 2L, 1L))
  }

  test("streams simulate independently in parallel") {
    val df = Seq(
      ("a", 0L, 100, 1L), ("a", 1L, 100, 2L),
      ("b", 0L, 100, 9L)).toDF("stream", "seq", "size", "containerId")
    val out = RestoreSim.simulate(df, 4, "lru").collect()
      .map(s => s.stream -> s.containerReads).toMap
    assert(out === Map("a" -> 2L, "b" -> 1L))
  }
}
