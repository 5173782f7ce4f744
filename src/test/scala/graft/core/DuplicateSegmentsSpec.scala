package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** DuplicateSegments semantics vs the reference's own regex oracle
  * (`DuplicateSegmentsLessThan.java:72-77`: reject iff the path matches
  * `.*(/.*)\1{t-1,}/.*` or `.*(/.*)\1{t-1,}`). */
class DuplicateSegmentsSpec extends AnyFunSuite {

  private def oracle(path: String, t: Int): Boolean = {
    val m0 = java.util.regex.Pattern.compile(".*(/.*)\\1{" + (t - 1) + ",}/.*")
    val m1 = java.util.regex.Pattern.compile(".*(/.*)\\1{" + (t - 1) + ",}")
    !(m0.matcher(path).matches() || m1.matcher(path).matches())
  }

  test("explicit cases (FiltersTest.java:163 style)") {
    assert(!DuplicateSegments.lessThan("/foo/bar/foo/bar/", 2))
    assert(DuplicateSegments.lessThan("/foo/bar/foo/baz/", 2))
    assert(!DuplicateSegments.lessThan("/a/a/a/", 3))
    assert(DuplicateSegments.lessThan("/a/a/b/", 3))
    assert(!DuplicateSegments.lessThan("/x/a/b/a/b/y", 2))
    assert(DuplicateSegments.lessThan("/x/a/b/a/c/y", 2))
    assert(DuplicateSegments.lessThan("/", 2))
    assert(DuplicateSegments.lessThan("", 2))
    // Non-aligned char repeats are NOT segment repeats:
    assert(DuplicateSegments.lessThan("/abab/", 2))
    // repeats must be consecutive:
    assert(DuplicateSegments.lessThan("/a/b/a/c/a/", 3))
  }

  test("property: agrees with the reference regex oracle (2000 random paths)") {
    val rnd = new scala.util.Random(42)
    val alphabet = Array("a", "b", "ab", "a1", "x")
    for (_ <- 1 to 2000) {
      val n = 1 + rnd.nextInt(8)
      val segs = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
      val path = "/" + segs.mkString("/") + (if (rnd.nextBoolean()) "/" else "")
      val t = 2 + rnd.nextInt(3)
      assert(DuplicateSegments.lessThan(path, t) == oracle(path, t), s"path=$path t=$t")
    }
  }
}
