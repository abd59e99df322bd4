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

  /** The full init_index forcing pass over an already-parsed config
    * (reference src/index/index.c:34-110), applied AFTER config loading
    * exactly like the reference: a named specific first pins the key
    * size and its published combination — preserving user sampling rates
    * and prefetch distances exactly where index.c does
    * (`rate > 1 ? rate : 128` for sampled/sparse,
    * `prefetch > 1 ? prefetch : 16` for BLC/SiLo; BLC notably does NOT
    * force a segmenting algorithm) — then the unconditional post-switch
    * rules run for EVERY config: EXACT ⇒ full key, PHYSICAL ⇒ fixed
    * segmenting, EXACT+PHYSICAL ⇒ uniform/1 sampling (index.c:99-109).
    *
    * Extreme Binning: the reference's config parser accepts the name
    * (config.c:142-145) but init_index has no forcing case and would
    * abort — an unfinished path upstream. We force the published system
    * instead (Bhagwat et al.): whole-file segments, min-fp features,
    * top-1 bin selection. Documented deviation.
    */
  def force(base: IndexConfig, specific: Option[String]): IndexConfig = {
    var c = base
    specific.map(_.toLowerCase).foreach { s =>
      c = c.copy(keyBytes = 20) // index.c:35 pins sizeof(fingerprint)
      c = s match {
        case "ddfs" =>
          c.copy(exact = true, logicalLocality = false)
        case "blc" =>
          c.copy(exact = true, logicalLocality = true,
            samplingMethod = "uniform", sampleRate = 1,
            segmentPrefetch = if (c.segmentPrefetch > 1) c.segmentPrefetch else 16)
        case "sampled" =>
          c.copy(exact = false, logicalLocality = false,
            samplingMethod = "uniform",
            sampleRate = if (c.sampleRate > 1) c.sampleRate else 128)
        case "sparse" =>
          c.copy(exact = false, logicalLocality = true,
            segmentMethod = "content", samplingMethod = "random",
            sampleRate = if (c.sampleRate > 1) c.sampleRate else 128,
            segmentPrefetch = 1)
        case "silo" =>
          c.copy(exact = false, logicalLocality = true,
            segmentMethod = "fixed", selectionTopK = 1,
            samplingMethod = "min", sampleRate = 0,
            segmentPrefetch = if (c.segmentPrefetch > 1) c.segmentPrefetch else 16)
        case "extreme_binning" =>
          c.copy(exact = false, logicalLocality = true,
            segmentMethod = "file", selectionTopK = 1,
            samplingMethod = "min", sampleRate = 0)
        case other =>
          throw new IllegalArgumentException(s"unknown index preset: $other")
      }
    }
    if (c.exact) c = c.copy(keyBytes = 20)
    if (!c.logicalLocality) {
      c = c.copy(segmentMethod = "fixed")
      if (c.exact) c = c.copy(samplingMethod = "uniform", sampleRate = 1)
    }
    // index.c:111 assert(index_key_size > 0 && <= sizeof(fingerprint)):
    // a 0/negative key size would make every truncated key "" and merge
    // the whole corpus into one cluster with no error
    require(c.keyBytes > 0 && c.keyBytes <= 20,
      s"fingerprint-index-key-size ${c.keyBytes} out of range (1..20)")
    c
  }

  /** A preset from reference defaults — [[force]] applied to the default
    * config, i.e. what `fingerprint-index ... <specific>` gives with no
    * other directives.
    */
  def preset(name: String): IndexConfig =
    force(IndexConfig(samplingMethod = "uniform", sampleRate = 1,
      segmentMethod = "fixed", selectionTopK = 1), Some(name))

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
