package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class IndexPresetSpec extends AnyFunSuite {

  // deterministic pseudo-fps: full 40-hex, distinct
  private def fps(n: Int): Seq[String] =
    (0 until n).map { i =>
      val h = graft.functions.Hash64.hashString(s"fp-$i")
      f"$h%016x" * 2 + f"${i}%08x"
    }

  test("preset matrix matches the reference forcing table (index.c:34-110)") {
    val ddfs = IndexPresets.preset("ddfs")
    assert(ddfs.exact && !ddfs.logicalLocality)
    assert(ddfs.samplingMethod == "uniform" && ddfs.sampleRate == 1)
    assert(ddfs.segmentMethod == "fixed" && ddfs.keyBytes == 20)

    val blc = IndexPresets.preset("blc")
    assert(blc.exact && blc.logicalLocality)
    assert(blc.samplingMethod == "uniform" && blc.sampleRate == 1)
    assert(blc.segmentPrefetch == 16)

    val sampled = IndexPresets.preset("sampled")
    assert(!sampled.exact && !sampled.logicalLocality)
    assert(sampled.samplingMethod == "uniform" && sampled.sampleRate == 128)
    assert(sampled.segmentMethod == "fixed")

    val sparse = IndexPresets.preset("sparse")
    assert(!sparse.exact && sparse.logicalLocality)
    assert(sparse.segmentMethod == "content")
    assert(sparse.samplingMethod == "random" && sparse.sampleRate == 128)
    assert(sparse.selectionTopK == 1 && sparse.segmentPrefetch == 1)

    val silo = IndexPresets.preset("silo")
    assert(!silo.exact && silo.logicalLocality)
    assert(silo.segmentMethod == "fixed")
    assert(silo.samplingMethod == "min" && silo.sampleRate == 0)
    assert(silo.selectionTopK == 1 && silo.segmentPrefetch == 16)

    val eb = IndexPresets.preset("extreme_binning")
    assert(!eb.exact && eb.logicalLocality)
    assert(eb.segmentMethod == "file")
    assert(eb.samplingMethod == "min" && eb.sampleRate == 0)

    assert(IndexPresets.names.size == 6)
    IndexPresets.names.foreach(n => IndexPresets.preset(n)) // all resolvable
    intercept[IllegalArgumentException](IndexPresets.preset("nope"))
  }

  test("segmentAndSample composes the forced primitives per preset") {
    val stream = fps(2500)

    // SiLo: fixed 1024 segments, min-sampled (ratio 0 ⇒ 1 feature each)
    val silo = IndexPresets.segmentAndSample(IndexPresets.preset("silo"))(stream)
    assert(silo.map(_._1) == Seq(0L, 1L, 2L))
    silo.foreach { case (seg, feats) =>
      val segFps = stream.slice(seg.toInt * 1024, math.min((seg.toInt + 1) * 1024, 2500))
      assert(feats == Set(segFps.min))
    }

    // Extreme Binning: one whole-file segment, representative = min fp
    val eb = IndexPresets.segmentAndSample(IndexPresets.preset("extreme_binning"))(stream)
    assert(eb == Seq((0L, Set(stream.min))))

    // Sparse Index: content-defined segmenting + random sampling — must
    // equal composing the primitives directly
    val cfg = IndexPresets.preset("sparse")
    val segs = Segmenting.contentDefined(cfg.segmentSize, cfg.segmentMin, cfg.segmentMax)(stream)
    val expected = stream.indices.groupBy(segs(_)).toSeq.sortBy(_._1).map {
      case (segId, idxs) =>
        (segId, Sampling.random(idxs.map(stream), cfg.sampleRate))
    }
    assert(IndexPresets.segmentAndSample(cfg)(stream) == expected)

    // DDFS: everything is a feature (uniform/1) — exact index
    val ddfs = IndexPresets.segmentAndSample(
      IndexPresets.preset("ddfs").copy(segmentSize = 512))(fps(600))
    assert(ddfs.map(_._2.size).sum == 600)
  }

  test("index_key_size truncation keeps prefix order and dedups correctly") {
    val keys = fps(500)
    assert(IndexPresets.truncateKey(keys.head, 20) == keys.head)
    val t4 = keys.map(IndexPresets.truncateKey(_, 4))
    assert(t4.forall(_.length == 8))
    // prefix order consistent with full-key order
    val sortedFull = keys.sorted.map(IndexPresets.truncateKey(_, 4))
    assert(sortedFull == sortedFull.sorted)
    // truncated sampling: min feature of truncated set == truncation of a
    // min-prefixed full key (prefix-order preservation)
    assert(t4.min == IndexPresets.truncateKey(keys.min, 4) ||
      keys.count(k => IndexPresets.truncateKey(k, 4) == t4.min) > 0)
    // at 4 bytes over 500 keys collisions are possible but dedup keys stay
    // usable: truncation is deterministic and stable
    assert(t4 == keys.map(IndexPresets.truncateKey(_, 4)))
  }

  test("segmentPrefetch admits the champion stream's following segments (BLC/Sparse/SiLo locality)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    def mk(repo: String, path: String, fs: Seq[String]): FileFeatures =
      FileFeatures(graft.functions.Hash64.fileId(repo, path, "0"),
        repo, path, "0", "md", fs.length * 10, "sha-" + path,
        fs.zipWithIndex.map { case (f, i) => ChunkInfo(i * 10, 10, f, false) },
        Array.empty, Array.empty, 0L)
    def fp(c: Char) = c.toString * 40
    // version-chain stream in repo "r": f1, f2, f3 in path order, one
    // 4-chunk segment each (min-sampled => 1 indexed feature per segment)
    val f1 = mk("r", "a", Seq(fp('1'), fp('2'), fp('3'), fp('4')))
    val f2 = mk("r", "b", Seq(fp('5'), fp('6'), fp('7'), fp('8')))
    val f3 = mk("r", "c", Seq(fp('9'), fp('a'), fp('b'), fp('c')))
    // query file shares f1's sampled min feature but NONE of f2/f3's
    // sampled features — prefetch-0 can only ever find f1
    val q = mk("rq", "q", Seq(fp('1'), fp('d'), fp('e'), fp('f')))
    val ds = spark.createDataset(Seq(f1, f2, f3, q))(
      org.apache.spark.sql.Encoders.product[FileFeatures])
    val base = IndexConfig(samplingMethod = "min", sampleRate = 0,
      segmentMethod = "fixed", segmentSize = 4)
    def pairs(p: Int): Set[(Long, Long)] =
      DedupPipeline.presetCandidates(ds, base.copy(segmentPrefetch = p))
        .as[(Long, Long)].collect().toSet
    def pr(x: FileFeatures, y: FileFeatures) =
      (math.min(x.fileId, y.fileId), math.max(x.fileId, y.fileId))
    assert(pairs(0) === Set(pr(q, f1)))
    assert(pairs(1) === Set(pr(q, f1), pr(q, f2)))
    assert(pairs(16) === Set(pr(q, f1), pr(q, f2), pr(q, f3)))
  }
}
