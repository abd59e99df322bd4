package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class DestorConfigSpec extends AnyFunSuite {

  test("parses the reference's SHIPPED destor.config end to end") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/destor.config")),
      java.nio.charset.StandardCharsets.UTF_8)
    val s = DestorConfig.parse(text)
    assert(s.chunker.algo == "fastcdc")
    assert(s.chunker.minSize == 2048 && s.chunker.avgSize == 8192 &&
      s.chunker.maxSize == 65536)
    // "block locality caching" (quoted, with its leading-space line):
    // categories assert exact+logical like config.c:138-141, then the
    // init_index forcing wins over the individual sampling/segmenting
    // directives (uniform/1, fixed segmenting, prefetch 16) while the
    // user's segment size/boundary survive
    assert(s.indexPreset.contains("blc"))
    assert(s.index.exact && s.index.logicalLocality)
    assert(s.index.samplingMethod == "uniform" && s.index.sampleRate == 1)
    assert(s.index.segmentMethod == "fixed")
    assert(s.index.segmentSize == 1024)
    assert(s.index.segmentMin == 128 && s.index.segmentMax == 10240)
    assert(s.index.segmentPrefetch == 16)
    assert(s.index.keyBytes == 20)
    assert(s.indexValueLength == 1)
    assert(s.rewrite.algorithm == "no")
    assert(s.rewrite.enableHar)
    assert(s.rewrite.harUtilizationThreshold == 0.5)
    assert(s.rewrite.harRewriteLimit == 0.05)
    assert(s.rewrite.cappingLevel == 14)
    assert(s.rewrite.cbrMinimalUtility == 0.5)
    assert(!s.rewrite.enableCacheAware)
    assert(s.restoreCache == "lru" && s.restoreCacheSize == 30)
    assert(s.restoreOptWindow == 1000000)
    assert(s.simulationLevel == "no" && s.traceFormat == "destor")
    assert(s.raw("backup-retention-time") == Seq("20"))
    assert(s.raw("working-directory") == Seq("/mnt/sda/destor/"))
  }

  test("sdssplitargs-style tokenization: quotes, escapes, unbalanced") {
    assert(DestorConfig.splitArgs("""a "b c" d""").contains(Seq("a", "b c", "d")))
    assert(DestorConfig.splitArgs("""a "x\ty" 'q w'""").contains(Seq("a", "x\ty", "q w")))
    assert(DestorConfig.splitArgs("""a "unbalanced""").isEmpty)
    assert(DestorConfig.splitArgs("""a 'unbalanced""").isEmpty)
    assert(DestorConfig.splitArgs("").contains(Seq.empty))
  }

  test("errors mirror the reference's loaderr cases") {
    intercept[IllegalArgumentException](DestorConfig.parse("no-such-directive 1"))
    intercept[IllegalArgumentException](DestorConfig.parse("chunk-algorithm lzw"))
    intercept[IllegalArgumentException](DestorConfig.parse("simulation-level maybe"))
    intercept[IllegalArgumentException](DestorConfig.parse("rewrite-enable-har perhaps"))
    intercept[IllegalArgumentException](DestorConfig.parse("restore-cache lru")) // arity
    // preset/category assertion (config.c:130-157): ddfs requires
    // exact + physical
    intercept[IllegalArgumentException](
      DestorConfig.parse("fingerprint-index near-exact logical ddfs"))
    // unbalanced quotes
    intercept[IllegalArgumentException](DestorConfig.parse("""chunk-algorithm "fixed"""
      .dropRight(1)))
  }

  test("rewrite-algorithm short and long names, buffer size, defaults") {
    val cap = DestorConfig.parse("rewrite-algorithm cap 64\nrewrite-capping-level 3")
    assert(cap.rewrite.algorithm == "cap" && cap.rewrite.bufferSize == 64 &&
      cap.rewrite.cappingLevel == 3)
    val cbr = DestorConfig.parse("rewrite-algorithm \"context-based rewriting\" 2048")
    assert(cbr.rewrite.algorithm == "cbr" && cbr.rewrite.bufferSize == 2048)
    val cfl = DestorConfig.parse(
      "rewrite-algorithm \"cfl-based selective deduplication\"")
    assert(cfl.rewrite.algorithm == "cfl" && cfl.rewrite.bufferSize == 1024)
  }

  test("parsed settings are executable: rewritePass and restoreSim dispatch") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val recipe = (1 to 300).map { i =>
      ("s", i.toLong, 64, (i % 7).toLong, i % 3 != 0)
    }.toDF("stream", "seq", "size", "containerId", "dup")
    val cap = DestorConfig.parse("rewrite-algorithm cap 64\nrewrite-capping-level 3")
    val marked = cap.rewritePass(recipe)
    assert(marked.columns.contains("outOfOrder"))
    // identical to calling the operator directly with the same knobs
    val direct = Rewrite.cap(recipe, 64, 3)
      .select($"stream", $"seq", $"outOfOrder").as[(String, Long, Boolean)]
      .collect().toSet
    val viaCfg = marked.select($"stream", $"seq", $"outOfOrder")
      .as[(String, Long, Boolean)].collect().toSet
    assert(viaCfg == direct)
    val opt = DestorConfig.parse("restore-cache opt 8\nrestore-opt-window-size 100")
    val sim = opt.restoreSim(recipe)
    assert(sim.count() == 1L)
    val lru = DestorConfig.parse("restore-cache lru 8").restoreSim(recipe)
    assert(lru.count() == 1L)
  }
}
