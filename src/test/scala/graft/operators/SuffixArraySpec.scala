package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The distributed suffix array must equal the sequential definition:
  * dense rank of every suffix in global lexicographic order.
  */
class SuffixArraySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rankMap(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    import spark.implicits._
    SuffixArray.ranks(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
  }

  /** Sequential oracle: sort all suffixes, dense-rank them. */
  private def brute(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sufs = for {
      (id, text) <- docs
      i <- 1 to text.length // test fixtures are BMP-only (1 cp = 1 char)
    } yield ((id, i.toLong), text.substring(i - 1))
    val order = sufs.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1).toLong }.toMap
    sufs.map { case (key, s) => key -> order(s) }.toMap
  }

  test("banana ranks match the sequential definition") {
    val docs = Seq((1L, "banana"))
    val got = rankMap(docs)
    // suffixes sorted: a < ana < anana < banana < na < nana
    assert(got === Map(
      (1L, 6L) -> 1L, (1L, 4L) -> 2L, (1L, 2L) -> 3L,
      (1L, 1L) -> 4L, (1L, 5L) -> 5L, (1L, 3L) -> 6L))
  }

  test("identical suffixes across documents share a dense rank") {
    val got = rankMap(Seq((1L, "abc"), (2L, "abc"), (3L, "")))
    assert(got((1L, 1L)) === got((2L, 1L)))
    assert(got((1L, 3L)) === got((2L, 3L)))
    assert(got.values.toSet === Set(1L, 2L, 3L), "dense over 3 distinct suffixes")
    assert(!got.keySet.exists(_._1 == 3L), "empty doc contributes no suffix")
  }

  test("random small-alphabet corpus matches brute force") {
    val rng = new scala.util.Random(42)
    val docs = (1L to 20L).map { id =>
      val len = rng.nextInt(41)
      id -> Array.fill(len)("ab".charAt(rng.nextInt(2))).mkString
    }.filter(_._2.nonEmpty)
    assert(rankMap(docs) === brute(docs))
  }

  test("max cross-doc LCP via rank-adjacency equals the suffix-automaton LCS") {
    val planted = "sharedplantedrun17"
    val docs = Seq(
      (1L, "prefix one " + planted + " suffix alpha"),
      (2L, "other body " + planted + " tail beta"),
      (3L, "wholly unrelated content here"))
    val ranks = rankMap(docs)
    val text = docs.toMap
    // walk suffixes in rank order; max LCP between adjacent suffixes of
    // DIFFERENT docs = the longest substring shared across documents
    // (the standard SA + LCP theorem, computed sequentially post-collect)
    val inOrder = ranks.toSeq.map { case ((id, pos), r) =>
      (r, text(id).substring(pos.toInt - 1), id)
    }.sortBy(t => (t._1, t._3, t._2))
    def lcp(a: String, b: String): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val maxCross = inOrder.sliding(2).collect {
      case Seq((_, sa, ia), (_, sb, ib)) if ia != ib => lcp(sa, sb)
    }.max
    val expect = graft.functions.Lcs.longestCommonSubstring(text(1L), text(2L))
    assert(expect === planted.length + 2, "planted run + flanking spaces")
    assert(maxCross === expect)
  }
}
