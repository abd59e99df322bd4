package graft.functions

/** Longest-common-substring via suffix automaton — the exact near-dup
  * span verifier (north star: "suffix-array substring matching for exact
  * near-dup spans"). Standard O(|a|) automaton construction over string
  * `a`, then a single O(|b|) scan of `b`. Used pair-level on candidate
  * survivors (small inputs per pair), never as a corpus-wide pass.
  */
object Lcs {

  private final class Sam(maxLen: Int) {
    val size = 2 * maxLen + 5
    val len = new Array[Int](size)
    val link = new Array[Int](size)
    val next = Array.fill(size)(scala.collection.mutable.Map.empty[Char, Int])
    var last = 0
    var cnt = 1
    link(0) = -1

    def extend(ch: Char): Unit = {
      val cur = cnt; cnt += 1
      len(cur) = len(last) + 1
      var p = last
      while (p != -1 && !next(p).contains(ch)) {
        next(p)(ch) = cur
        p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = next(p)(ch)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = cnt; cnt += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          next(clone) ++= next(q)
          while (p != -1 && next(p).get(ch).contains(q)) {
            next(p)(ch) = clone
            p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
    }
  }

  /** Length of the longest common substring of a and b. */
  def longestCommonSubstring(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val sam = new Sam(a.length)
    a.foreach(sam.extend)
    var v = 0
    var l = 0
    var best = 0
    b.foreach { ch =>
      while (v != 0 && !sam.next(v).contains(ch)) {
        v = sam.link(v)
        l = sam.len(v)
      }
      if (sam.next(v).contains(ch)) {
        v = sam.next(v)(ch)
        l += 1
        if (l > best) best = l
      }
    }
    best
  }
}
