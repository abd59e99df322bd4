package graft.pipeline

/** Fingerprint-index configuration (reference: the `fingerprint-index`
  * namespace of destor.config, parsed in src/config.c:112-230, defaults
  * src/destor.c:94-113):
  *
  *  - `exact`            — category[0]: exact vs near-exact dedup
  *  - `logicalLocality`  — category[1]: logical (recipe) vs physical
  *                         (container) locality
  *  - `samplingMethod`/`sampleRate` — feature sampling inside a segment
  *  - `segmentMethod`/`segmentSize` (+ min/max for content-defined)
  *  - `selectionTopK`    — champion segment selection breadth
  *  - `segmentPrefetch`  — how many following segments a hit prefetches
  *  - `keyBytes`         — index_key_size: bytes of the 20-byte SHA-1
  *                         retained as the index key (truncation knob,
  *                         src/index/kvstore_htable.c:13-14,
  *                         destor.config:77)
  */
final case class IndexConfig(
    exact: Boolean = true,
    logicalLocality: Boolean = false,
    samplingMethod: String = "uniform",
    sampleRate: Int = 1,
    segmentMethod: String = "fixed",
    segmentSize: Int = 1024,
    segmentMin: Int = 128,
    segmentMax: Int = 10240,
    selectionTopK: Int = 1,
    segmentPrefetch: Int = 0,
    keyBytes: Int = 20)

/** The index-preset matrix (reference src/index/index.c:34-110): each
  * published system is a forced sampling/segmenting/selection combination.
  * `preset(name)` reproduces the reference's forcing switch plus its
  * post-switch rules (EXACT ⇒ full key; PHYSICAL ⇒ fixed segmenting, and
  * with EXACT also uniform/1 sampling), so "run SiLo" is a one-liner like
  * `fingerprint-index exact physical ddfs` in destor.config.
  */
object IndexPresets {

  /** All preset names, in reference INDEX_SPECIFIC_* order. */
  val names: Seq[String] =
    Seq("ddfs", "extreme_binning", "silo", "sparse", "sampled", "blc")

  def preset(name: String): IndexConfig = name.toLowerCase match {
    // DDFS: exact + physical locality (index.c:37-41); post-forcing gives
    // fixed segmenting and uniform/1 sampling (index.c:103-109)
    case "ddfs" =>
      IndexConfig(exact = true, logicalLocality = false,
        samplingMethod = "uniform", sampleRate = 1,
        segmentMethod = "fixed", keyBytes = 20)
    // Block Locality Caching: exact + logical, uniform/1, prefetch 16
    // (index.c:43-52)
    case "blc" =>
      IndexConfig(exact = true, logicalLocality = true,
        samplingMethod = "uniform", sampleRate = 1,
        segmentMethod = "fixed", segmentPrefetch = 16, keyBytes = 20)
    // Sampled Index: near-exact + physical, uniform/128 (index.c:54-62);
    // post-forcing gives fixed segmenting (index.c:103-104)
    case "sampled" =>
      IndexConfig(exact = false, logicalLocality = false,
        samplingMethod = "uniform", sampleRate = 128,
        segmentMethod = "fixed", keyBytes = 20)
    // Sparse Index: near-exact + logical, content-defined segmenting,
    // top selection, random/128 sampling, prefetch 1 (index.c:64-77)
    case "sparse" =>
      IndexConfig(exact = false, logicalLocality = true,
        samplingMethod = "random", sampleRate = 128,
        segmentMethod = "content", selectionTopK = 1,
        segmentPrefetch = 1, keyBytes = 20)
    // SiLo: near-exact + logical, fixed segmenting, top-1 selection,
    // min/0 sampling, prefetch 16 (index.c:79-93)
    case "silo" =>
      IndexConfig(exact = false, logicalLocality = true,
        samplingMethod = "min", sampleRate = 0,
        segmentMethod = "fixed", selectionTopK = 1,
        segmentPrefetch = 16, keyBytes = 20)
    // Extreme Binning: the reference's config parser accepts the name
    // (config.c:142-145, asserting near-exact + logical) but init_index
    // has no forcing case for it and would abort — an unfinished path in
    // the reference. We force the published system instead (Bhagwat et
    // al.): whole-file segments, the minimum fp as the representative
    // feature, top-1 bin selection. Documented deviation.
    case "extreme_binning" =>
      IndexConfig(exact = false, logicalLocality = true,
        samplingMethod = "min", sampleRate = 0,
        segmentMethod = "file", selectionTopK = 1, keyBytes = 20)
    case other =>
      throw new IllegalArgumentException(s"unknown index preset: $other")
  }

  /** index_key_size truncation: keep the first keyBytes bytes of the hex
    * SHA-1 (2 hex chars per byte). Hex prefix order == memcmp prefix
    * order, so truncated keys compare exactly like the reference's
    * truncated binary keys.
    */
  def truncateKey(fpHex: String, keyBytes: Int): String =
    if (keyBytes >= 20) fpHex else fpHex.substring(0, keyBytes * 2)

  /** Segment a file/stream's fp sequence and sample each segment's
    * features under the preset — the pure fold both the Spark pipeline
    * and the scalar oracle share. Returns (segId, truncated features).
    */
  def segmentAndSample(cfg: IndexConfig)(fps: Seq[String]): Seq[(Long, Set[String])] = {
    val segs = cfg.segmentMethod match {
      case "fixed" => Segmenting.fixed(cfg.segmentSize)(fps)
      case "content" =>
        Segmenting.contentDefined(cfg.segmentSize, cfg.segmentMin, cfg.segmentMax)(fps)
      case "file" => Segmenting.fileDefined(fps)
      case other => throw new IllegalArgumentException(s"unknown segmenting: $other")
    }
    fps.indices.groupBy(segs(_)).toSeq.sortBy(_._1).map { case (segId, idxs) =>
      val segFps = idxs.map(fps)
      val feats = Sampling.sample(cfg.samplingMethod, segFps, cfg.sampleRate)
        .map(truncateKey(_, cfg.keyBytes))
      (segId, feats)
    }
  }
}
