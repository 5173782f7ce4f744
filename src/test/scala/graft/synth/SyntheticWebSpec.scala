package graft.synth

import org.scalatest.funsuite.AnyFunSuite

/** Determinism + shape of the synthetic web (FIXTURES.md §1) and the
  * per-row span-sequence invariant (BASELINE.json input_hint). */
class SyntheticWebSpec extends AnyFunSuite {

  val cfg = SyntheticWeb.Config(sites = 100, degree = 5, maxDepth = 3, seed = 42L)

  test("successors are deterministic and well-formed") {
    val seed = SyntheticWeb.seedUrl(0, cfg)
    assert(seed.startsWith("http://"))
    val s1 = SyntheticWeb.successors(seed, cfg)
    val s2 = SyntheticWeb.successors(seed, cfg)
    assert(s1 == s2)
    assert(s1.forall(_.startsWith("http://")))
    assert(s1.forall(_.endsWith("index.html")))
  }

  test("seed list is deterministic and mostly distinct") {
    val seeds1 = (0 until 16).map(SyntheticWeb.seedUrl(_, cfg))
    val seeds2 = (0 until 16).map(SyntheticWeb.seedUrl(_, cfg))
    assert(seeds1 == seeds2)
    assert(seeds1.distinct.size > 4) // popularity skew allows some collisions
  }

  test("robots.txt page has no outlinks") {
    val seed = SyntheticWeb.seedUrl(1, cfg)
    assert(SyntheticWeb.successors(seed.stripSuffix("/") + "/robots.txt", cfg).isEmpty)
  }

  test("pages past max depth are 404 with no spans") {
    val host = graft.core.Burl.host(SyntheticWeb.seedUrl(2, cfg))
    val deep = s"http://$host/0/0/0/0/0/0/0/0/0/0/0/index.html" // depth 11 > 3*maxDepth
    assert(SyntheticWeb.status(deep, cfg) == 404)
    assert(SyntheticWeb.pageSpans(deep, cfg).isEmpty)
    assert(SyntheticWeb.successors(deep, cfg).isEmpty)
  }

  test("span-sequence invariant: deterministic (kind, text, media_ref, offset)") {
    val urls = (0 until 8).map(SyntheticWeb.seedUrl(_, cfg)).distinct
    for (u <- urls) {
      val a = SyntheticWeb.pageSpans(u, cfg)
      val b = SyntheticWeb.pageSpans(u, cfg)
      assert(a == b, s"spans not deterministic for $u")
      assert(a.nonEmpty)
      // offsets are exactly 0..n-1 in document order
      assert(a.map(_.offset) == a.indices.toSeq)
      // interleaving: every mediaEvery-th span is media with a ref and no text
      a.foreach { sp =>
        if (sp.offset % cfg.mediaEvery == cfg.mediaEvery - 1) {
          assert(sp.kind == "media" && sp.media_ref.nonEmpty && sp.text.isEmpty)
        } else {
          assert(sp.kind == "text" && sp.text.nonEmpty && sp.media_ref.isEmpty)
        }
      }
    }
  }

  test("graph links stay in-host except externals; depth changes by one") {
    val seed = SyntheticWeb.seedUrl(3, cfg)
    val host = graft.core.Burl.host(seed)
    val succ = SyntheticWeb.successors(seed, cfg)
    val (ext, int) = succ.partition(u => graft.core.Burl.host(u) != host)
    // seed is at depth 0: internal links must go one deeper
    assert(int.forall(_.count(_ == '/') == seed.count(_ == '/') + 1))
    assert(ext.size <= succ.size / 2) // roughly 1/10 external on average
  }

  test("robots prefixes deterministic; fraction of hosts non-empty") {
    val hosts = (0 until 200).map(i => graft.core.Burl.host(SyntheticWeb.seedUrl(i, cfg))).distinct
    val withRobots = hosts.count(h => SyntheticWeb.robotsPrefixes(h, cfg).nonEmpty)
    assert(withRobots > 0, "some hosts must have disallow rules")
    assert(withRobots < hosts.size, "not all hosts disallow")
    for (h <- hosts.take(10))
      assert(SyntheticWeb.robotsPrefixes(h, cfg) == SyntheticWeb.robotsPrefixes(h, cfg))
  }
}
