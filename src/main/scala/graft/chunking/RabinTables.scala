package graft.chunking

/** Precomputed Rabin fingerprint tables for the reference's irreducible
  * polynomial 0xbfe6b8a5bf378d83 over a 48-byte window
  * (reference: src/chunking/rabin_chunking.c:6,31-33,185-233).
  *
  * `T` folds the outgoing high byte back into the fingerprint after each
  * shift; `U` removes the contribution of the byte leaving the window.
  * All arithmetic is carry-less GF(2) polynomial math on 64-bit words;
  * Scala's Long xor/shift semantics match the C unsigned ops bit-for-bit
  * (logical shifts via >>>).
  */
object RabinTables {

  val Poly: Long = 0xbfe6b8a5bf378d83L
  private val MSB64: Long = 0x8000000000000000L

  /** 1-based index of highest set bit; 0 for 0 (reference fls64,
    * src/chunking/rabin_chunking.c:63-82).
    */
  private def fls64(v: Long): Int =
    if (v == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** (nh·2^64 + nl) mod d in GF(2)
    * (reference: src/chunking/rabin_chunking.c:84-126).
    */
  private def polymod(nh0: Long, nl0: Long, d0: Long): Long = {
    var nh = nh0
    var nl = nl0
    val k = fls64(d0) - 1
    val d = d0 << (63 - k)
    if (nh != 0) {
      if ((nh & MSB64) != 0) nh ^= d
      var i = 62
      while (i >= 0) {
        if ((nh & (1L << i)) != 0) {
          nh ^= d >>> (63 - i)
          nl ^= d << (i + 1)
        }
        i -= 1
      }
    }
    var i = 63
    while (i >= k) {
      if ((nl & (1L << i)) != 0) nl ^= d >>> (63 - i)
      i -= 1
    }
    nl
  }

  /** x·y in GF(2), 128-bit result (reference: rabin_chunking.c:128-160). */
  private def polymult(x: Long, y: Long): (Long, Long) = {
    var ph = 0L
    var pl = 0L
    if ((x & 1L) != 0) pl = y
    var i = 1
    while (i < 64) {
      if ((x & (1L << i)) != 0) {
        ph ^= y >>> (64 - i)
        pl ^= y << i
      }
      i += 1
    }
    (ph, pl)
  }

  private def polymmult(x: Long, y: Long, d: Long): Long = {
    val (h, l) = polymult(x, y)
    polymod(h, l, d)
  }

  /** degree(poly) - 1 - 8; = 55 for the shipped poly. */
  val shift: Int = fls64(Poly) - 1 - 8

  /** T table (reference calcT: src/chunking/rabin_chunking.c:185-212). */
  val T: Array[Long] = {
    val xshift = fls64(Poly) - 1
    val t1 = polymod(0L, 1L << xshift, Poly)
    Array.tabulate(256)(j => polymmult(j.toLong, t1, Poly) | (j.toLong << xshift))
  }

  private def append8(p: Long, m: Int): Long =
    ((p << 8) | (m & 0xffL)) ^ T((p >>> shift).toInt)

  /** U table for a 48-byte window (reference window_init:
    * src/chunking/rabin_chunking.c:219-233).
    */
  val U: Array[Long] = {
    var sizeshift = 1L
    var i = 1
    while (i < 48) { sizeshift = append8(sizeshift, 0); i += 1 }
    Array.tabulate(256)(j => polymmult(j.toLong, sizeshift, Poly))
  }
}
