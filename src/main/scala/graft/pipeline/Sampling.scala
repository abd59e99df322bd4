package graft.pipeline

/** Feature-sampling methods over a segment's fingerprint sequence
  * (reference: src/index/sampling_method.c). Pure functions on hex SHA-1
  * strings; hex lexicographic order == memcmp byte order, so comparisons
  * match `g_fingerprint_cmp` exactly.
  *
  * Feature keys are the full 20-byte fp (index_key_size default 20,
  * destor.config); key truncation is a prefix take on the hex string.
  */
object Sampling {

  /** ⌈chunkNum/ratio⌉-with-rounding feature count used by min/optmin
    * (src/index/sampling_method.c:14-23).
    */
  def featureNum(chunkNum: Int, ratio: Int): Int = {
    if (ratio == 0 || chunkNum <= ratio) 1
    else {
      val remain = chunkNum % ratio
      val n = chunkNum / ratio
      if (remain * 2 > ratio) n + 1 else n
    }
  }

  /** Uniform sampling: every ratio-th chunk (src/index/sampling_method.c:210-240). */
  def uniform(fps: Seq[String], ratio: Int): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    var count = 0
    fps.foreach { fp =>
      if (count % ratio == 0) out += fp
      count += 1
    }
    if (out.isEmpty) out += "0" * 40
    out.toSet
  }

  /** Random (hash-mod) sampling: fp tail int32 % ratio == 0
    * (src/index/sampling_method.c:175-208; Sparse Index semantics).
    */
  def random(fps: Seq[String], ratio: Int): Set[String] = {
    val out = fps.filter(fp => Segmenting.fpTailInt(fp) % ratio == 0).toSet
    if (out.isEmpty) Set("0" * 40) else out
  }

  /** Min sampling: the featureNum smallest fps, duplicates occupying
    * candidate slots exactly as in the reference's sorted GSequence
    * (src/index/sampling_method.c:12-76; Extreme Binning with
    * featureNum=1, SiLo).
    */
  def minSample(fps: Seq[String], ratio: Int): Set[String] = {
    val fn = featureNum(fps.length, ratio)
    val candidates = scala.collection.mutable.ArrayBuffer.empty[String]
    fps.foreach { fp =>
      if (candidates.length < fn || fp < candidates.last) {
        // insert keeping ascending order (duplicates allowed)
        val pos = candidates.indexWhere(_ > fp) match {
          case -1 => candidates.length
          case p => p
        }
        candidates.insert(pos, fp)
        if (candidates.length > fn) candidates.remove(candidates.length - 1)
      }
    }
    if (candidates.isEmpty) Set("f" * 40) else candidates.toSet
  }

  /** Optimized min sampling: anchors are the featureNum smallest fps, the
    * emitted feature is the fp 8 positions *before* each anchor
    * (src/index/sampling_method.c:81-170).
    */
  def optimizedMin(fps: Seq[String], ratio: Int): Set[String] = {
    val off = 8
    val fn = featureNum(fps.length, ratio)
    // (anchor, candidate) kept ascending by anchor, duplicates allowed
    val anchors = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val prefix = scala.collection.mutable.ArrayBuffer.fill(off + 1)("f" * 40)
    var count = 0
    fps.foreach { fp =>
      prefix.insert(0, fp)
      prefix.remove(prefix.length - 1)
      if (anchors.length < fn || fp < anchors.last._1) {
        val candidate = if (count >= off) prefix(off) else prefix(count)
        val pos = anchors.indexWhere(_._1 > fp) match {
          case -1 => anchors.length
          case p => p
        }
        anchors.insert(pos, (fp, candidate))
        if (anchors.length > fn) anchors.remove(anchors.length - 1)
      }
      count += 1
    }
    if (anchors.isEmpty) Set("f" * 40) else anchors.map(_._2).toSet
  }

  def sample(method: String, fps: Seq[String], ratio: Int): Set[String] =
    method match {
      case "uniform" => uniform(fps, ratio)
      case "random" => random(fps, ratio)
      case "min" => minSample(fps, ratio)
      case "optmin" => optimizedMin(fps, ratio)
      case other => throw new IllegalArgumentException(s"unknown sampling: $other")
    }
}
