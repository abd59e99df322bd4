package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Repo-granularity dedup semantics on hand-built repo trees: fork
  * detection (exact Jaccard values, prefix-filter losslessness vs a
  * brute-force replay), Merkle subtree census (vendored-dir detection
  * across different mount points, whole-repo clones), fork families.
  */
class RepoDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def filesDf(rows: Seq[(String, String, String)]) = {
    import spark.implicits._
    rows.toDF("repo", "path", "content")
  }

  test("forkPairs: exact Jaccard arithmetic, threshold edges, null content") {
    // A: 10 files. B: drops 3 of A's, adds 1 new → inter 7, union 11,
    // J = 7/11 ≈ 0.636. C: disjoint. D: exact clone of A → J = 1.
    val a = (0 until 10).map(i => ("A", s"f$i.c", s"content-$i"))
    val b = (3 until 10).map(i => ("B", s"f$i.c", s"content-$i")) :+
      (("B", "new.c", "b-only"))
    val c = (0 until 10).map(i => ("C", s"f$i.c", s"other-$i"))
    val d = (0 until 10).map(i => ("D", s"g$i.c", s"content-$i")) :+
      (("D", "nul.c", null: String)) // null content never counts
    val got = RepoDedup.forkPairs(filesDf(a ++ b ++ c ++ d), 50)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === Set(("A", "B"), ("A", "D"), ("B", "D")))
    assert(got(("A", "B")) === ((10L, 8L, 7L))) // J = 7/11 ≥ 0.5
    assert(got(("A", "D")) === ((10L, 10L, 10L))) // exact clone
    assert(got(("B", "D")) === ((8L, 10L, 7L)))
    // at θ=70: 100·7 < 70·11 → A-B and B-D drop, clone survives
    val tight = RepoDedup.forkPairs(filesDf(a ++ b ++ c ++ d), 70)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(tight === Set(("A", "D")))
  }

  test("forkPairs prefix filter is lossless vs brute force on a random corpus") {
    val rnd = new scala.util.Random(11)
    // 30 repos drawing 8-15 files from a pool of 18 contents → dense
    // accidental overlap on both sides of the θ=0.5 threshold
    val rows = for {
      r <- 0 until 30
      f <- 0 until (8 + rnd.nextInt(8))
    } yield (s"r$r", s"d${f % 3}/f$f.c", s"pool-${rnd.nextInt(18)}")
    val got = RepoDedup.forkPairs(filesDf(rows), 50)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // brute force over the same sets
    val sets = rows.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val brute = (for {
      (ra, sa) <- sets.toSeq; (rb, sb) <- sets.toSeq if ra < rb
      inter = (sa & sb).size
      if inter * 100 >= (sa.size + sb.size - inter) * 50
    } yield ((ra, rb), (sa.size.toLong, sb.size.toLong, inter.toLong))).toMap
    assert(got === brute)
    assert(brute.nonEmpty, "fixture must actually produce fork pairs")
  }

  test("dirCensus: vendored subtree matches across mount points and repos") {
    // lib vendored at X:vendor/lib and Y:third_party/lib (identical rel
    // paths + contents); X and Y differ elsewhere; Z duplicates the lib
    // WITHIN itself at two mount points.
    val lib = Seq(("util.c", "lib-util"), ("deep/io.c", "lib-io"))
    def mount(repo: String, at: String) =
      lib.map { case (p, c) => (repo, s"$at/$p", c) }
    val rows = mount("X", "vendor/lib") ++ mount("Y", "third_party/lib") ++
      mount("Z", "a/lib") ++ mount("Z", "b/lib") :+
      (("X", "main.c", "x-main")) :+ (("Y", "main.c", "y-main"))
    val census = RepoDedup.dirCensus(filesDf(rows))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // the four lib mounts share one signature: 4 locations, 3 repos
    val libSig = census(("X", "vendor/lib"))
    assert(libSig._1 === 2L) // 2 files in the subtree
    assert(libSig._3 === 4L && libSig._4 === 3L)
    for (k <- Seq(("Y", "third_party/lib"), ("Z", "a/lib"), ("Z", "b/lib")))
      assert(census(k) === libSig, s"$k")
    // nested dir matches too (deep/ under each mount)
    assert(census(("X", "vendor/lib/deep"))._3 === 4L)
    // roots differ (X,Y have extra mains; Z's root is its own shape)
    assert(census(("X", ""))._3 === 1L)
    assert(census(("Y", ""))._3 === 1L)
    // and the PARENT dirs match too: X's vendor/, Y's third_party/ and
    // Z's a/ and b/ all contain exactly {lib/util.c, lib/deep/io.c} —
    // location-independence means the mount parents are equal subtrees
    assert(census(("X", "vendor")) === census(("Y", "third_party")))
    assert(census(("X", "vendor")) === census(("Z", "a")))
    assert(census(("X", "vendor"))._3 === 4L && census(("X", "vendor"))._4 === 3L)
  }

  test("dirCensus: whole-repo clones match at the root; tree shape matters") {
    val a = Seq(("A", "s/x.c", "1"), ("A", "s/y.c", "2"))
    val clone = Seq(("B", "s/x.c", "1"), ("B", "s/y.c", "2"))
    // same contents, different layout → different root signature
    val moved = Seq(("C", "t/x.c", "1"), ("C", "s/y.c", "2"))
    val census = RepoDedup.dirCensus(filesDf(a ++ clone ++ moved))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    assert(census(("A", "")) === census(("B", "")))
    assert(census(("A", "")) !== census(("C", "")))
    // leading slashes normalize away: "/s/x.c" is the same tree as "s/x.c"
    val slashed = Seq(("E", "/s/x.c", "1"), ("E", "/s/y.c", "2"))
    val c2 = RepoDedup.dirCensus(filesDf(a ++ slashed))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    assert(c2(("E", "")) === c2(("A", "")))
    assert(c2(("E", "s")) === c2(("A", "s")))
    // C's s/ dir (just y.c) differs from A's s/ (x.c + y.c)
    assert(census(("A", "s")) !== census(("C", "s")))
  }

  test("dirPrune: one canonical location per identical subtree") {
    val lib = Seq(("util.c", "lib-util"), ("deep/io.c", "lib-io"))
    def mount(repo: String, at: String) =
      lib.map { case (p, c) => (repo, s"$at/$p", c) }
    val rows = mount("X", "vendor/lib") ++ mount("Y", "third_party/lib") ++
      mount("Z", "a/lib") :+ (("X", "main.c", "x-main"))
    val got = RepoDedup.dirPrune(filesDf(rows))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getString(5), r.getString(6), r.getBoolean(7)))).toMap
    // lib class: canonical = min of (X,vendor/lib), (Y,third_party/lib),
    // (Z,a/lib) → ("X","vendor/lib")? No: struct order compares repo
    // first, so ("X","vendor/lib") < ("Y",...) < ("Z",...)
    assert(got(("X", "vendor/lib")) === (("X", "vendor/lib", true)))
    assert(got(("Y", "third_party/lib")) === (("X", "vendor/lib", false)))
    assert(got(("Z", "a/lib")) === (("X", "vendor/lib", false)))
    // unique subtrees keep themselves (X root has the extra main.c)
    assert(got(("X", ""))._3 === true)
    assert(got(("Y", ""))._3 === true)
  }

  test("forkPrune: biggest member wins, name breaks ties, singletons keep") {
    // family {rA(9), rB(9), rC(10)}: rC biggest → canon; family {rX(5),
    // rY(5)}: tie → min name rX; rD singleton keeps itself.
    // NB rX/rXtra are prefix-pair names — guards the arg-min tie-break
    val a = (0 until 9).map(i => ("rA", s"f$i.c", s"c-$i"))
    val b = (1 until 10).map(i => ("rB", s"f$i.c", s"c-$i"))
    val c = (0 until 10).map(i => ("rC", s"f$i.c", s"c-$i"))
    val x = (0 until 5).map(i => ("rX", s"g$i.c", s"x-$i"))
    val y = (0 until 5).map(i => ("rXtra", s"g$i.c", s"x-$i"))
    val d = Seq(("rD", "f.c", "solo"))
    val got = RepoDedup.forkPrune(filesDf(a ++ b ++ c ++ x ++ y ++ d), 50)
      .collect().map(r => (r.getString(0),
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getBoolean(5)))).toMap
    assert(got("rC") === (("rA", 3L, 10L, "rC", true)))
    assert(got("rA") === (("rA", 3L, 9L, "rC", false)))
    assert(got("rB") === (("rA", 3L, 9L, "rC", false)))
    assert(got("rX") === (("rX", 2L, 5L, "rX", true)))
    assert(got("rXtra") === (("rX", 2L, 5L, "rX", false)))
    assert(got("rD") === (("rD", 1L, 1L, "rD", true)))
  }

  test("commitDeltas: arrival, carry-over, modification, full-rewrite ratios") {
    import spark.implicits._
    // repo R: c0 = {a=1, b=2}; c1 = {a=1, b=2', c=3} (b modified, c new);
    // c2 = {a=1, b=2', c=3} (pure carry); repo S: one commit, all new
    val rows = Seq(
      ("R", 0L, "a", "1"), ("R", 0L, "b", "2"),
      ("R", 1L, "a", "1"), ("R", 1L, "b", "2x"), ("R", 1L, "c", "3"),
      ("R", 2L, "a", "1"), ("R", 2L, "b", "2x"), ("R", 2L, "c", "3"),
      ("S", 0L, "a", "other"), ("S", 0L, "nul", null))
    val got = RepoDedup.commitDeltas(rows.toDF("repo", "cseq", "path", "content"))
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("R", 0L)) === ((2L, 2L, 0L, 100L)))
    assert(got(("R", 1L)) === ((3L, 2L, 1L, 66L))) // b' + c new, a carried
    assert(got(("R", 2L)) === ((3L, 0L, 3L, 0L)))  // pure carry-over
    assert(got(("S", 0L)) === ((1L, 1L, 0L, 100L))) // null content dropped
    // reverting b back to "2" in a later commit is NOT new again — the
    // version (path, digest) was already introduced at c0
    val revert = rows :+ (("R", 3L, "b", "2"))
    val g2 = RepoDedup.commitDeltas(revert.toDF("repo", "cseq", "path", "content"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    assert(g2(("R", 3L)) === 0L)
  }

  test("forkFamilies: transitive families, singletons, lexicographic canon") {
    // A≈B, B≈C (chain), D alone
    val a = (0 until 9).map(i => ("rA", s"f$i.c", s"c-$i"))
    val b = (2 until 11).map(i => ("rB", s"f$i.c", s"c-$i"))
    val c = (4 until 13).map(i => ("rC", s"f$i.c", s"c-$i"))
    val d = Seq(("rD", "f.c", "solo"))
    val fams = RepoDedup.forkFamilies(filesDf(a ++ b ++ c ++ d), 50)
      .collect().map(r => (r.getString(0), (r.getString(1), r.getLong(2)))).toMap
    // J(A,B) = 7/11 ≥ .5, J(B,C) = 7/11, J(A,C) = 5/13 < .5 → one chain family
    assert(fams("rA") === (("rA", 3L)))
    assert(fams("rB") === (("rA", 3L)))
    assert(fams("rC") === (("rA", 3L)))
    assert(fams("rD") === (("rD", 1L)))
  }
}
