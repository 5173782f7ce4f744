package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Cases from the reference's `test/.../util/URLRespectsRobotsTest.java`
  * (FIXTURES.md §5), expressed over content strings instead of a local
  * HTTP proxy — the parse/match semantics under test are identical. */
class RobotsSpec extends AnyFunSuite {

  private val UA = "BUbiNG"

  test("disallow all") {
    val f = Robots.parse("User-agent: *\nDisallow: /\n", UA)
    assert(f.toSeq == Seq("/"))
    assert(!Robots.allowed(f, "/foo/bar"))
    assert(!Robots.allowed(f, "/"))
  }

  test("agent-specific section takes precedence over *") {
    // goodguy gets empty disallow, badguy everything, * everything.
    val content =
      """User-agent: goodguy
        |Disallow:
        |
        |User-agent: badguy
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /private/
        |""".stripMargin
    val good = Robots.parse(content, "goodguy")
    assert(good.isEmpty)
    assert(Robots.allowed(good, "/private/x"))
    val bad = Robots.parse(content, "badguy")
    assert(bad.toSeq == Seq("/"))
    assert(!Robots.allowed(bad, "/anything"))
    val other = Robots.parse(content, "random-agent")
    assert(other.toSeq == Seq("/private/"))
    assert(!Robots.allowed(other, "/private/x"))
    assert(Robots.allowed(other, "/public/x"))
  }

  test("user-agent prefix match is case-insensitive") {
    val f = Robots.parse("User-agent: bub\nDisallow: /x/\n", UA)
    assert(f.toSeq == Seq("/x/")) // "bub" is a prefix of "BUbiNG" (ignoring case)
  }

  test("empty disallow in matching section clears the set") {
    val f = Robots.parse("User-agent: *\nDisallow: /a/\nDisallow:\n", UA)
    assert(f.isEmpty)
  }

  test("trailing star stripped (URLRespectsRobots.java:145)") {
    val f = Robots.parse("User-agent: *\nDisallow: /a*\n", UA)
    assert(f.toSeq == Seq("/a"))
    assert(!Robots.allowed(f, "/abc"))
    assert(Robots.allowed(f, "/b"))
  }

  test("UTF-8 BOM skipped (URLRespectsRobots.java:182-188)") {
    val f = Robots.parse("﻿User-agent: *\nDisallow: /q/\n", UA)
    assert(f.toSeq == Seq("/q/"))
  }

  test("comments and unknown lines ignored; blank line ends record") {
    val content =
      """# a comment
        |User-agent: *
        |Crawl-delay: 10
        |Disallow: /a/
        |
        |Disallow: /b/
        |""".stripMargin
    val f = Robots.parse(content, UA)
    // Reference quirk: a blank line resets only `doesMatter`, NOT
    // `starSection` (URLRespectsRobots.java:109-111), so the stray
    // "Disallow: /b/" after the blank line still lands in the * set.
    assert(f.toSeq == Seq("/a/", "/b/"))
  }

  test("prefix-free compression (toSortedPrefixFreeCharArrays)") {
    val f = Robots.toSortedPrefixFree(Seq("/a/b", "/a", "/c", "/c/d/e", "/b"))
    assert(f.toSeq == Seq("/a", "/b", "/c"))
  }

  test("binary-search matcher agrees with naive prefix scan") {
    val f = Robots.toSortedPrefixFree(Seq("/a/", "/cgi-bin/", "/z", "/m/n/"))
    val paths = Seq("/", "/a/", "/a/x", "/b", "/cgi-bin/q?x=1", "/cgi-bim", "/m/n/o", "/m/x", "/z", "/zz", "/y")
    for (pq <- paths) {
      val naive = !f.exists(pq.startsWith(_))
      assert(Robots.allowed(f, pq) == naive, s"path $pq")
    }
  }

  test("empty filter allows everything") {
    assert(Robots.allowed(Array.empty[String], "/anything"))
  }
}
