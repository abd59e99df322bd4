package graft.pipeline

/** Segmenting methods (reference: src/index/segmenting_method.c).
  *
  * The reference segments the *backup stream*; the batch analog segments
  * each (repo,path,commit) file's chunk sequence — or a whole repo stream
  * when folds are applied per repo. These are pure sequence functions so
  * the same code runs in Spark folds and in the scalar oracle.
  */
object Segmenting {

  /** int32 little-endian from hex SHA-1 chars [32,40) — the reference's
    * `*(int*)&fp[16]` (src/index/segmenting_method.c:94,
    * src/index/sampling_method.c:189).
    */
  def fpTailInt(fpHex: String): Int = {
    def byteAt(i: Int): Int = Integer.parseInt(fpHex.substring(i, i + 2), 16)
    byteAt(32) | (byteAt(34) << 8) | (byteAt(36) << 16) | (byteAt(38) << 24)
  }

  /** Fixed segmenting: every n chunks (src/index/segmenting_method.c:12-38). */
  def fixed(n: Int)(fps: Seq[String]): Array[Long] = {
    val out = new Array[Long](fps.length)
    var i = 0
    while (i < fps.length) { out(i) = i / n; i += 1 }
    out
  }

  /** Content-defined segmenting (src/index/segmenting_method.c:72-112):
    * a chunk whose fp tail satisfies tail % avg == 0 *starts* a new
    * segment, provided the current segment has ≥ min chunks; a segment
    * reaching max chunks is closed (boundary chunk included).
    * Defaults: avg 1024, min 128, max 10240 (destor.config:96-99).
    */
  def contentDefined(avg: Int = 1024, min: Int = 128, max: Int = 10240)(
      fps: Seq[String]): Array[Long] = {
    val out = new Array[Long](fps.length)
    var seg = 0L
    var num = 0
    var i = 0
    while (i < fps.length) {
      if (num < min) {
        out(i) = seg; num += 1
      } else if (fpTailInt(fps(i)) % avg == 0) {
        seg += 1; out(i) = seg; num = 1
      } else {
        out(i) = seg; num += 1
        if (num >= max) { seg += 1; num = 0 }
      }
      i += 1
    }
    out
  }

  /** File-defined segmenting (src/index/segmenting_method.c:43-67): the
    * whole file is one segment — trivially segId 0 per file.
    */
  def fileDefined(fps: Seq[String]): Array[Long] = new Array[Long](fps.length)
}
