package graft.chunking

import java.security.MessageDigest

/** Chunking configuration mirroring the reference engine's knobs
  * (reference: src/destor.h:201-203, destor.config:28-34).
  *
  * Defaults are the shipped config: FastCDC, avg 8 KiB, min 2 KiB,
  * max 64 KiB (reference: destor.config:28-34, src/destor.c:86-92).
  */
final case class ChunkerConfig(
    algo: String = "fastcdc",
    minSize: Int = 2048,
    avgSize: Int = 8192,
    maxSize: Int = 65536)

/** One chunk boundary: byte offset and length within the file. */
final case class ChunkBound(offset: Int, length: Int)

/** Content-defined chunking algorithms.
  *
  * Semantics-faithful Scala reimplementations of the reference's chunker
  * family (reference: src/chunking/fascdc_chunking.c, rabin_chunking.c,
  * ae_chunking.c; driver loop src/chunk_phase.c:20-110). Each `cut`
  * function is pure: given bytes `p[off, off+n)` it returns the length of
  * the next chunk. The reference invokes the same signature repeatedly
  * over the remaining stream, with no state carried across invocations
  * (each call zero-initialises its rolling window), which is what makes
  * per-file parallel chunking possible here.
  */
object Chunkers {

  /** (bytes, startOffset, remainingLength) => next chunk length */
  type CutFn = (Array[Byte], Int, Int) => Int

  // ---------------------------------------------------------------------
  // FastCDC (gear CDC) — reference: src/chunking/fascdc_chunking.c:52-105
  // ---------------------------------------------------------------------

  /** Gear table: entry i = first 8 bytes (little-endian) of MD5 over a
    * 64-byte buffer filled with byte value i
    * (reference: src/chunking/fascdc_chunking.c:52-67).
    */
  lazy val gearTable: Array[Long] = {
    val md = MessageDigest.getInstance("MD5")
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      val seed = Array.fill[Byte](64)(i.toByte)
      md.reset()
      val d = md.digest(seed)
      // little-endian memcpy of the first 8 digest bytes into a u64
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (d(j) & 0xffL); j -= 1 }
      t(i) = v
      i += 1
    }
    t
  }

  // Hard-coded in the reference regardless of config
  // (src/chunking/fascdc_chunking.c:69-71)
  private val FastCdcMin = 2048
  private val FastCdcMax = 65536
  private val FastCdcMaskA = 0x0000d90f03530000L // sparse mask before Mid
  private val FastCdcMaskB = 0x0000d90003530000L // dense mask after Mid

  /** FastCDC cut point (reference: src/chunking/fascdc_chunking.c:75-105). */
  def fastcdc(p: Array[Byte], off: Int, nIn: Int): Int = {
    var n = nIn
    var i = FastCdcMin
    var mid = FastCdcMin + 8 * 1024
    if (n <= FastCdcMin) return n
    if (n > FastCdcMax) n = FastCdcMax
    else if (n < mid) mid = n
    val gear = gearTable
    var fp = 0L
    while (i < mid) {
      fp = (fp << 1) + gear(p(off + i) & 0xff)
      if ((fp & FastCdcMaskA) == 0L) return i
      i += 1
    }
    while (i < n) {
      fp = (fp << 1) + gear(p(off + i) & 0xff)
      if ((fp & FastCdcMaskB) == 0L) return i
      i += 1
    }
    i
  }

  // ---------------------------------------------------------------------
  // Rabin family — reference: src/chunking/rabin_chunking.c
  // ---------------------------------------------------------------------

  private val BreakmarkValue = 0x78L // src/chunking/rabin_chunking.c:7
  private val WindowSize = 48 // src/chunking/rabin_chunking.c:32

  /** Rolling-window state for one rabin scan (local to each cut call,
    * mirroring the locals in src/chunking/rabin_chunking.c:253-280).
    */
  private final class RabinWindow {
    val buf = new Array[Byte](WindowSize)
    var bufPos = -1
    var fp = 0L
    /** SLIDE macro (reference: src/chunking/rabin_chunking.c:13-25). */
    def slide(m: Byte): Unit = {
      bufPos += 1
      if (bufPos >= WindowSize) bufPos = 0
      val om = buf(bufPos) & 0xff
      buf(bufPos) = m
      var f = fp ^ RabinTables.U(om)
      val x = (f >>> RabinTables.shift).toInt
      f = (f << 8) | (m & 0xffL)
      f ^= RabinTables.T(x)
      fp = f
    }
  }

  /** Standard Rabin CDC (reference: src/chunking/rabin_chunking.c:253-280).
    * `avg` must be a power of two (the reference rounds it down to one:
    * src/chunk_phase.c:116-121).
    */
  def rabin(minSize: Int, avgSize: Int, maxSize: Int)(
      p: Array[Byte], off: Int, n: Int): Int = {
    val mask = avgSize - 1L
    if (n <= minSize) return n
    var i = minSize
    val end = if (n > maxSize) maxSize else n
    val w = new RabinWindow
    while (i < end) {
      w.slide(p(off + i - 1))
      if ((w.fp & mask) == BreakmarkValue) return i
      i += 1
    }
    i
  }

  /** Normalized Rabin: larger avg below Mid, smaller above
    * (reference: src/chunking/rabin_chunking.c:282-345; params hard-coded
    * by normalized_rabin_init: expect 8192, min 6144, max 65536).
    */
  def normalizedRabin(p: Array[Byte], off: Int, nIn: Int): Int = {
    val expect = 8192
    val minSz = 6144
    val maxSz = 65536
    val maskA = expect * 4L - 1
    val maskB = expect / 4L - 1
    var n = nIn
    var i = minSz
    var mid = minSz + 4 * 1024
    if (n <= minSz) return n
    if (n > maxSz) n = maxSz
    else if (n < mid) mid = n
    val w = new RabinWindow
    // warm-up: slide the 47 bytes preceding position i-1
    // (reference: src/chunking/rabin_chunking.c:322-324)
    var j = 48
    while (j >= 2) { w.slide(p(off + i - j)); j -= 1 }
    while (i < mid) {
      w.slide(p(off + i - 1))
      if ((w.fp & maskA) == BreakmarkValue) return i
      i += 1
    }
    while (i < n) {
      w.slide(p(off + i - 1))
      if ((w.fp & maskB) == BreakmarkValue) return i
      i += 1
    }
    i
  }

  /** TTTD: main breakmark at avg, backup breakmark at avg/2 remembered as
    * fallback (reference: src/chunking/rabin_chunking.c:352-387).
    */
  def tttd(minSize: Int, avgSize: Int, maxSize: Int)(
      p: Array[Byte], off: Int, n: Int): Int = {
    val mainMask = avgSize - 1L
    val backMask = avgSize / 2L - 1
    if (n <= minSize) return n
    var i = minSize
    var m = 0
    val end = if (n > maxSize) maxSize else n
    val w = new RabinWindow
    while (i < end) {
      w.slide(p(off + i - 1))
      if ((w.fp & backMask) == BreakmarkValue) {
        if ((w.fp & mainMask) == BreakmarkValue) return i
        m = i
      }
      i += 1
    }
    if (m != 0) m else i
  }

  // ---------------------------------------------------------------------
  // AE (asymmetric extremum) — reference: src/chunking/ae_chunking.c
  // ---------------------------------------------------------------------

  /** window = 12000/(e-1) with the reference's truncated e
    * (reference: src/chunking/ae_chunking.c:27-30).
    */
  val aeWindowSize: Int = (12000 / (2.718281828 - 1)).toInt

  /** Big-endian u64 read at p[i..i+8). */
  private def be64(p: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (p(i + j) & 0xffL); j += 1 }
    v
  }

  /** AE cut point (reference: src/chunking/ae_chunking.c:35-54).
    * Extremum comparison is an unsigned big-endian u64 compare where ties
    * move the extremum (my_memcmp never returns 0, :10-20).
    */
  def ae(maxSize: Int)(p: Array[Byte], off: Int, n: Int): Int = {
    val ws = aeWindowSize
    if (n <= ws + 8) return n
    var curr = 1
    var mx = 0
    val end = n - 8
    while (curr <= end) {
      if (java.lang.Long.compareUnsigned(be64(p, off + curr), be64(p, off + mx)) > 0) {
        if (curr == mx + ws || curr == maxSize) return curr
      } else {
        mx = curr
      }
      curr += 1
    }
    n
  }

  // ---------------------------------------------------------------------
  // Fixed / file-level — reference: src/chunk_phase.c:12-14,161-171
  // ---------------------------------------------------------------------

  def fixed(avgSize: Int)(p: Array[Byte], off: Int, n: Int): Int =
    if (avgSize > n) n else avgSize

  /** Container geometry (reference: src/storage/containerstore.h:13-16). */
  val ContainerSize: Int = 4 * 1024 * 1024
  val ContainerMetaSize: Int = 32 * 1024

  /** Approximate file-level chunking = fixed chunks of the container
    * payload capacity (reference: src/chunk_phase.c:161-171).
    */
  def fileLevel(p: Array[Byte], off: Int, n: Int): Int =
    fixed(ContainerSize - ContainerMetaSize)(p, off, n)

  // ---------------------------------------------------------------------
  // Dispatch + full-file boundary scan
  // ---------------------------------------------------------------------

  /** Round avg down to a power of two as the reference does for the rabin
    * family (reference: src/chunk_phase.c:116-121).
    */
  def floorPow2(v: Int): Int = {
    var pwr = 0
    var x = v
    while (x != 0) { x >>= 1; pwr += 1 }
    1 << (pwr - 1)
  }

  def forConfig(cfg: ChunkerConfig): CutFn = cfg.algo match {
    case "fastcdc" => fastcdc
    case "rabin" =>
      rabin(cfg.minSize, floorPow2(cfg.avgSize), cfg.maxSize)
    case "normalized_rabin" => normalizedRabin
    case "tttd" =>
      tttd(cfg.minSize, floorPow2(cfg.avgSize), cfg.maxSize)
    case "ae" => ae(cfg.maxSize)
    case "fixed" => fixed(cfg.avgSize)
    case "file" => fileLevel
    case other => throw new IllegalArgumentException(s"unknown chunker: $other")
  }

  /** Split a whole file into chunk bounds by repeatedly applying `cut` to
    * the remaining bytes, exactly like the reference's chunk thread loop
    * (reference: src/chunk_phase.c:53-94).
    */
  def boundaries(p: Array[Byte], cut: CutFn): Array[ChunkBound] = {
    if (p.isEmpty) return Array.empty
    val out = Array.newBuilder[ChunkBound]
    var off = 0
    while (off < p.length) {
      val len = cut(p, off, p.length - off)
      out += ChunkBound(off, len)
      off += len
    }
    out.result()
  }

  def boundaries(p: Array[Byte], cfg: ChunkerConfig): Array[ChunkBound] =
    boundaries(p, forConfig(cfg))

  /** True iff the chunk is all zero bytes (reference: src/chunk_phase.c:84-89). */
  def isZeroChunk(p: Array[Byte], off: Int, len: Int): Boolean = {
    var i = 0
    while (i < len) { if (p(off + i) != 0) return false; i += 1 }
    true
  }
}
